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

  /** GEV parameters (shape k, scale alpha, loc xi) from sample L-moments —
    * Hosking (1990) rational approximation: z = 2/(3+t3) − ln2/ln3,
    * k = 7.8590 z + 2.9554 z². Sign convention matches scipy
    * `genextreme.c` (k > 0 = bounded upper tail). `q8` quantizes the
    * Γ(1+k) transcendental so an external oracle's libm cannot diverge. */
  def gevLmom(l1: Column, l2: Column, t3: Column,
              quantize: Int = -1): (Column, Column, Column) = {
    def q(c: Column, extra: Int): Column =
      if (quantize >= 0) round(c, quantize + extra) else c
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
}
