package graft.indices

import graft.functions.SpecialFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distribution fits beyond gamma/normal — the engine's twin of
  * `xclim/indices/stats.py:115 fit` for `genextreme`, `gumbel_r` and
  * `lognorm`, with the PWM ("L-Moments") parameter maps of Hosking (1990)
  * that the reference delegates to the lmoments3 package, and the ML
  * closed forms where they exist.
  *
  * Everything is pure Column arithmetic over per-group aggregates:
  * the L-moment route needs one `sort_array(collect_list(...))` per group
  * (group size = number of blocks, e.g. years — bounded state), the ML
  * lognorm route needs only avg/stddev of ln x (two partial-aggregable
  * scalars, nothing collected). Quantile (ppf) maps are closed-form
  * scalars, codegen'd end to end.
  */
object Distributions {

  /** floor(x·10^k + 0.5)/10^k — the engine-portable quantization grid
    * (r12): replaces BigDecimal HALF_UP `round(x, k)` at the kernels'
    * quantize points with the same floor expression the oracles spell
    * inline, so both engines share ONE rounding algorithm (identical to
    * HALF_UP for positive values; ties toward +∞ for negatives on BOTH
    * sides). */
  private[indices] def qGrid(c: Column, k: Int): Column = {
    val s = math.pow(10.0, k.toDouble)
    floor(c * lit(s) + lit(0.5)).cast("double") / lit(s)
  }

  /** GEV parameters (shape k, scale alpha, loc xi) from sample L-moments —
    * Hosking (1990) rational approximation: z = 2/(3+t3) − ln2/ln3,
    * k = 7.8590 z + 2.9554 z². Sign convention matches scipy
    * `genextreme.c` (k > 0 = bounded upper tail). `q8` quantizes the
    * Γ(1+k) transcendental so an external oracle's libm cannot diverge. */
  def gevLmom(l1: Column, l2: Column, t3: Column,
              quantize: Int = -1): (Column, Column, Column) = {
    def q(c: Column, extra: Int): Column =
      if (quantize >= 0) qGrid(c, quantize + extra) else c
    // ln2/ln3 pinned as a literal: JVM Math.log and a C libm may round the
    // quotient differently at the last ulp, and k feeds transcendentals
    val z = lit(2.0) / (lit(3.0) + t3) - lit(0.6309297535714574)
    val k = q(lit(7.8590) * z + lit(2.9554) * z * z, 0)
    val gk = q(SpecialFunctions.gammaFn(lit(1.0) + k), 2)
    val alpha = l2 * k / (gk * (lit(1.0) - pow(lit(2.0), -k)))
    val xi = l1 - alpha * (lit(1.0) - gk) / k
    (k, alpha, xi)
  }

  /** GEV quantile: xi + alpha/k · (1 − (−ln p)^k), k ≠ 0. */
  def gevQuantile(p: Column, shape: Column, scale: Column, loc: Column): Column =
    loc + scale / shape * (lit(1.0) - pow(-log(p), shape))

  /** Gumbel (gumbel_r) parameters from L-moments: alpha = l2/ln2,
    * xi = l1 − γ·alpha (γ = Euler–Mascheroni). */
  def gumbelLmom(l1: Column, l2: Column): (Column, Column) = {
    val alpha = l2 / 0.6931471805599453 // ln2 pinned (oracle bit-parity)
    val xi = l1 - lit(0.5772156649015329) * alpha
    (alpha, xi)
  }

  /** Gumbel quantile: xi − alpha · ln(−ln p). */
  def gumbelQuantile(p: Column, scale: Column, loc: Column): Column =
    loc - scale * log(-log(p))

  /** Lognormal ML fit with floc=0 (stats.py `lognorm` "ML"): closed form
    * mu = mean(ln x), sigma = population std(ln x); aggregate Columns —
    * use inside .agg. Returns (sigma = scipy `s`, mu; scipy scale=exp(mu)). */
  def lognormMl(x: Column): (Column, Column) =
    (stddev_pop(log(x)), avg(log(x)))

  /** Lognormal quantile: exp(mu + sigma · probit(p)). */
  def lognormQuantile(p: Column, sigma: Column, mu: Column): Column =
    exp(mu + sigma * SpecialFunctions.probit(p))

  /** Fisk / log-logistic APP parameters (stats.py:653 `_fit_start`) from the
    * first two moments m1 = E[x], m2 = E[x²] of the (x − floc) sample:
    * scale = 2 m1³/(m2 + m1²)... — see Evapotranspiration.spei for the
    * pipelined form; exposed here for symmetry. */
  def fiskApp(m1: Column, m2: Column): (Column, Column) = {
    val scale = lit(2.0) * pow(m1, 3) / (m2 + m1 * m1)
    val c = lit(math.Pi) * m1 / (sqrt(lit(3.0)) * sqrt(m2 - m1 * m1))
    (c, scale)
  }

  /** Fisk quantile: scale · (p/(1−p))^(1/c). */
  def fiskQuantile(p: Column, c: Column, scale: Column): Column =
    scale * pow(p / (lit(1.0) - p), lit(1.0) / c)

  // --- parametric_cdf (stats.py:221 dist_method dispatch targets) ---

  /** Gumbel CDF: exp(−exp(−(x−loc)/scale)). */
  def gumbelCdf(x: Column, scale: Column, loc: Column): Column =
    exp(-exp(-(x - loc) / scale))

  /** GEV CDF (scipy `genextreme.c` sign convention, k ≠ 0):
    * exp(−(1 − k z)^(1/k)), z = (x−loc)/scale, on the support. */
  def gevCdf(x: Column, shape: Column, scale: Column, loc: Column): Column = {
    val z = (x - loc) / scale
    val t = lit(1.0) - shape * z
    when(t > 0.0, exp(-pow(t, lit(1.0) / shape)))
      .otherwise(when(shape > 0.0, 1.0).otherwise(0.0))
  }

  /** Fisk CDF: 1/(1 + (x/scale)^(−c)). */
  def fiskCdf(x: Column, c: Column, scale: Column): Column =
    lit(1.0) / (lit(1.0) + pow(x / scale, -c))

  /** Lognormal CDF via the regularized incomplete gamma identity
    * Phi(z) = (1 + sign(z) P(1/2, z^2/2))/2. */
  def lognormCdf(x: Column, sigma: Column, mu: Column): Column = {
    val z = (log(x) - mu) / sigma
    (lit(1.0) + signum(z) *
      graft.functions.SpecialFunctions.gammaCdf(z * z / 2.0, lit(0.5), lit(1.0))) / 2.0
  }

  /** `dist_method` (stats.py:506): string-dispatched quantile/cdf for the
    * supported distributions — the generic entry config files use. */
  def distMethod(method: String, dist: String, x: Column,
                 params: Map[String, Column]): Column = (method, dist) match {
    case ("ppf", "gumbel_r")   => gumbelQuantile(x, params("scale"), params("loc"))
    case ("cdf", "gumbel_r")   => gumbelCdf(x, params("scale"), params("loc"))
    case ("ppf", "genextreme") => gevQuantile(x, params("shape"), params("scale"), params("loc"))
    case ("cdf", "genextreme") => gevCdf(x, params("shape"), params("scale"), params("loc"))
    case ("ppf", "fisk")       => fiskQuantile(x, params("c"), params("scale"))
    case ("cdf", "fisk")       => fiskCdf(x, params("c"), params("scale"))
    case ("ppf", "lognorm")    => lognormQuantile(x, params("sigma"), params("mu"))
    case ("cdf", "lognorm")    => lognormCdf(x, params("sigma"), params("mu"))
    case ("ppf", "gamma") =>
      graft.functions.SpecialFunctions.gammaPpf(x, params("shape"), params("scale"))
    case ("cdf", "gamma") =>
      graft.functions.SpecialFunctions.gammaCdf(x, params("shape"), params("scale"))
    case ("pdf", "gamma")   => gammaPdf(x, params("shape"), params("scale"))
    case ("pdf", "norm")    => normPdf(x, params("loc"), params("scale"))
    case ("pdf", "lognorm") => lognormPdf(x, params("sigma"), params("mu"))
    case (m, d) => throw new IllegalArgumentException(s"dist_method: no $m for $d")
  }

  // ---- densities (stats.py:363 `parametric_pdf`) ------------------------

  /** Gamma density: exp((k−1)·ln x − x/θ − lnΓ(k) − k·ln θ). */
  def gammaPdf(x: Column, shape: Column, scale: Column): Column =
    when(x <= 0.0, 0.0).otherwise(exp((shape - 1.0) * log(x) - x / scale
      - graft.functions.SpecialFunctions.logGamma(shape) - shape * log(scale)))

  /** Normal density. */
  def normPdf(x: Column, mu: Column, sigma: Column): Column =
    exp(lit(-0.5) * pow((x - mu) / sigma, 2.0)) /
      (sigma * math.sqrt(2.0 * math.Pi))

  /** Log-normal density (sigma/mu of ln x). */
  def lognormPdf(x: Column, sigma: Column, mu: Column): Column =
    when(x <= 0.0, 0.0).otherwise(
      exp(lit(-0.5) * pow((log(x) - mu) / sigma, 2.0)) /
        (x * sigma * math.sqrt(2.0 * math.Pi)))
}
