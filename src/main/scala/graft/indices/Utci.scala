package graft.indices

import graft.functions.SpecialFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Universal Thermal Climate Index (converters.py:2389
  * `universal_thermal_climate_index`, :2157 `_utci`) and
  * mean radiant temperature (:2538), as pure codegen'd Column math.
  *
  * The 210-term 6th-order UTCI offset polynomial (Broede et al. 2012, the
  * public UTCI_a002 coefficients) is driven by ONE coefficient table:
  * `column` builds the Spark expression and `sqlExpr` emits a term-by-term
  * identical ANSI-SQL string for external engines, so the two evaluate the
  * exact same IEEE operation sequence (left-assoc sums and products, no pow).
  * Cost at any scale: one projection, no shuffle.
  */
object Utci {

  /** (coefficient, tas power, wind power, (mrt - tas) power, pa power). */
  private val terms: Array[(Double, Int, Int, Int, Int)] = Array(
    (6.07562052e-1, 0, 0, 0, 0),
    (-2.27712343e-2, 1, 0, 0, 0),
    (8.06470249e-4, 2, 0, 0, 0),
    (-1.54271372e-4, 3, 0, 0, 0),
    (-3.24651735e-6, 4, 0, 0, 0),
    (7.32602852e-8, 5, 0, 0, 0),
    (1.35959073e-9, 6, 0, 0, 0),
    (-2.25836520e0, 0, 1, 0, 0),
    (8.80326035e-2, 1, 1, 0, 0),
    (2.16844454e-3, 2, 1, 0, 0),
    (-1.53347087e-5, 3, 1, 0, 0),
    (-5.72983704e-7, 4, 1, 0, 0),
    (-2.55090145e-9, 5, 1, 0, 0),
    (-7.51269505e-1, 0, 2, 0, 0),
    (-4.08350271e-3, 1, 2, 0, 0),
    (-5.21670675e-5, 2, 2, 0, 0),
    (1.94544667e-6, 3, 2, 0, 0),
    (1.14099531e-8, 4, 2, 0, 0),
    (1.58137256e-1, 0, 3, 0, 0),
    (-6.57263143e-5, 1, 3, 0, 0),
    (2.22697524e-7, 2, 3, 0, 0),
    (-4.16117031e-8, 3, 3, 0, 0),
    (-1.27762753e-2, 0, 4, 0, 0),
    (9.66891875e-6, 1, 4, 0, 0),
    (2.52785852e-9, 2, 4, 0, 0),
    (4.56306672e-4, 0, 5, 0, 0),
    (-1.74202546e-7, 1, 5, 0, 0),
    (-5.91491269e-6, 0, 6, 0, 0),
    (3.98374029e-1, 0, 0, 1, 0),
    (1.83945314e-4, 1, 0, 1, 0),
    (-1.73754510e-4, 2, 0, 1, 0),
    (-7.60781159e-7, 3, 0, 1, 0),
    (3.77830287e-8, 4, 0, 1, 0),
    (5.43079673e-10, 5, 0, 1, 0),
    (-2.00518269e-2, 0, 1, 1, 0),
    (8.92859837e-4, 1, 1, 1, 0),
    (3.45433048e-6, 2, 1, 1, 0),
    (-3.77925774e-7, 3, 1, 1, 0),
    (-1.69699377e-9, 4, 1, 1, 0),
    (1.69992415e-4, 0, 2, 1, 0),
    (-4.99204314e-5, 1, 2, 1, 0),
    (2.47417178e-7, 2, 2, 1, 0),
    (1.07596466e-8, 3, 2, 1, 0),
    (8.49242932e-5, 0, 3, 1, 0),
    (1.35191328e-6, 1, 3, 1, 0),
    (-6.21531254e-9, 2, 3, 1, 0),
    (-4.99410301e-6, 0, 4, 1, 0),
    (-1.89489258e-8, 1, 4, 1, 0),
    (8.15300114e-8, 0, 5, 1, 0),
    (7.55043090e-4, 0, 0, 2, 0),
    (-5.65095215e-5, 1, 0, 2, 0),
    (-4.52166564e-7, 2, 0, 2, 0),
    (2.46688878e-8, 3, 0, 2, 0),
    (2.42674348e-10, 4, 0, 2, 0),
    (1.54547250e-4, 0, 1, 2, 0),
    (5.24110970e-6, 1, 1, 2, 0),
    (-8.75874982e-8, 2, 1, 2, 0),
    (-1.50743064e-9, 3, 1, 2, 0),
    (-1.56236307e-5, 0, 2, 2, 0),
    (-1.33895614e-7, 1, 2, 2, 0),
    (2.49709824e-9, 2, 2, 2, 0),
    (6.51711721e-7, 0, 3, 2, 0),
    (1.94960053e-9, 1, 3, 2, 0),
    (-1.00361113e-8, 0, 4, 2, 0),
    (-1.21206673e-5, 0, 0, 3, 0),
    (-2.18203660e-7, 1, 0, 3, 0),
    (7.51269482e-9, 2, 0, 3, 0),
    (9.79063848e-11, 3, 0, 3, 0),
    (1.25006734e-6, 0, 1, 3, 0),
    (-1.81584736e-9, 1, 1, 3, 0),
    (-3.52197671e-10, 2, 1, 3, 0),
    (-3.36514630e-8, 0, 2, 3, 0),
    (1.35908359e-10, 1, 2, 3, 0),
    (4.17032620e-10, 0, 3, 3, 0),
    (-1.30369025e-9, 0, 0, 4, 0),
    (4.13908461e-10, 1, 0, 4, 0),
    (9.22652254e-12, 2, 0, 4, 0),
    (-5.08220384e-9, 0, 1, 4, 0),
    (-2.24730961e-11, 1, 1, 4, 0),
    (1.17139133e-10, 0, 2, 4, 0),
    (6.62154879e-10, 0, 0, 5, 0),
    (4.03863260e-13, 1, 0, 5, 0),
    (1.95087203e-12, 0, 1, 5, 0),
    (-4.73602469e-12, 0, 0, 6, 0),
    (5.12733497e0, 0, 0, 0, 1),
    (-3.12788561e-1, 1, 0, 0, 1),
    (-1.96701861e-2, 2, 0, 0, 1),
    (9.99690870e-4, 3, 0, 0, 1),
    (9.51738512e-6, 4, 0, 0, 1),
    (-4.66426341e-7, 5, 0, 0, 1),
    (5.48050612e-1, 0, 1, 0, 1),
    (-3.30552823e-3, 1, 1, 0, 1),
    (-1.64119440e-3, 2, 1, 0, 1),
    (-5.16670694e-6, 3, 1, 0, 1),
    (9.52692432e-7, 4, 1, 0, 1),
    (-4.29223622e-2, 0, 2, 0, 1),
    (5.00845667e-3, 1, 2, 0, 1),
    (1.00601257e-6, 2, 2, 0, 1),
    (-1.81748644e-6, 3, 2, 0, 1),
    (-1.25813502e-3, 0, 3, 0, 1),
    (-1.79330391e-4, 1, 3, 0, 1),
    (2.34994441e-6, 2, 3, 0, 1),
    (1.29735808e-4, 0, 4, 0, 1),
    (1.29064870e-6, 1, 4, 0, 1),
    (-2.28558686e-6, 0, 5, 0, 1),
    (-3.69476348e-2, 0, 0, 1, 1),
    (1.62325322e-3, 1, 0, 1, 1),
    (-3.14279680e-5, 2, 0, 1, 1),
    (2.59835559e-6, 3, 0, 1, 1),
    (-4.77136523e-8, 4, 0, 1, 1),
    (8.64203390e-3, 0, 1, 1, 1),
    (-6.87405181e-4, 1, 1, 1, 1),
    (-9.13863872e-6, 2, 1, 1, 1),
    (5.15916806e-7, 3, 1, 1, 1),
    (-3.59217476e-5, 0, 2, 1, 1),
    (3.28696511e-5, 1, 2, 1, 1),
    (-7.10542454e-7, 2, 2, 1, 1),
    (-1.24382300e-5, 0, 3, 1, 1),
    (-7.38584400e-9, 1, 3, 1, 1),
    (2.20609296e-7, 0, 4, 1, 1),
    (-7.32469180e-4, 0, 0, 2, 1),
    (-1.87381964e-5, 1, 0, 2, 1),
    (4.80925239e-6, 2, 0, 2, 1),
    (-8.75492040e-8, 3, 0, 2, 1),
    (2.77862930e-5, 0, 1, 2, 1),
    (-5.06004592e-6, 1, 1, 2, 1),
    (1.14325367e-7, 2, 1, 2, 1),
    (2.53016723e-6, 0, 2, 2, 1),
    (-1.72857035e-8, 1, 2, 2, 1),
    (-3.95079398e-8, 0, 3, 2, 1),
    (-3.59413173e-7, 0, 0, 3, 1),
    (7.04388046e-7, 1, 0, 3, 1),
    (-1.89309167e-8, 2, 0, 3, 1),
    (-4.79768731e-7, 0, 1, 3, 1),
    (7.96079978e-9, 1, 1, 3, 1),
    (1.62897058e-9, 0, 2, 3, 1),
    (3.94367674e-8, 0, 0, 4, 1),
    (-1.18566247e-9, 1, 0, 4, 1),
    (3.34678041e-10, 0, 1, 4, 1),
    (-1.15606447e-10, 0, 0, 5, 1),
    (-2.80626406e0, 0, 0, 0, 2),
    (5.48712484e-1, 1, 0, 0, 2),
    (-3.99428410e-3, 2, 0, 0, 2),
    (-9.54009191e-4, 3, 0, 0, 2),
    (1.93090978e-5, 4, 0, 0, 2),
    (-3.08806365e-1, 0, 1, 0, 2),
    (1.16952364e-2, 1, 1, 0, 2),
    (4.95271903e-4, 2, 1, 0, 2),
    (-1.90710882e-5, 3, 1, 0, 2),
    (2.10787756e-3, 0, 2, 0, 2),
    (-6.98445738e-4, 1, 2, 0, 2),
    (2.30109073e-5, 2, 2, 0, 2),
    (4.17856590e-4, 0, 3, 0, 2),
    (-1.27043871e-5, 1, 3, 0, 2),
    (-3.04620472e-6, 0, 4, 0, 2),
    (5.14507424e-2, 0, 0, 1, 2),
    (-4.32510997e-3, 1, 0, 1, 2),
    (8.99281156e-5, 2, 0, 1, 2),
    (-7.14663943e-7, 3, 0, 1, 2),
    (-2.66016305e-4, 0, 1, 1, 2),
    (2.63789586e-4, 1, 1, 1, 2),
    (-7.01199003e-6, 2, 1, 1, 2),
    (-1.06823306e-4, 0, 2, 1, 2),
    (3.61341136e-6, 1, 2, 1, 2),
    (2.29748967e-7, 0, 3, 1, 2),
    (3.04788893e-4, 0, 0, 2, 2),
    (-6.42070836e-5, 1, 0, 2, 2),
    (1.16257971e-6, 2, 0, 2, 2),
    (7.68023384e-6, 0, 1, 2, 2),
    (-5.47446896e-7, 1, 1, 2, 2),
    (-3.59937910e-8, 0, 2, 2, 2),
    (-4.36497725e-6, 0, 0, 3, 2),
    (1.68737969e-7, 1, 0, 3, 2),
    (2.67489271e-8, 0, 1, 3, 2),
    (3.23926897e-9, 0, 0, 4, 2),
    (-3.53874123e-2, 0, 0, 0, 3),
    (-2.21201190e-1, 1, 0, 0, 3),
    (1.55126038e-2, 2, 0, 0, 3),
    (-2.63917279e-4, 3, 0, 0, 3),
    (4.53433455e-2, 0, 1, 0, 3),
    (-4.32943862e-3, 1, 1, 0, 3),
    (1.45389826e-4, 2, 1, 0, 3),
    (2.17508610e-4, 0, 2, 0, 3),
    (-6.66724702e-5, 1, 2, 0, 3),
    (3.33217140e-5, 0, 3, 0, 3),
    (-2.26921615e-3, 0, 0, 1, 3),
    (3.80261982e-4, 1, 0, 1, 3),
    (-5.45314314e-9, 2, 0, 1, 3),
    (-7.96355448e-4, 0, 1, 1, 3),
    (2.53458034e-5, 1, 1, 1, 3),
    (-6.31223658e-6, 0, 2, 1, 3),
    (3.02122035e-4, 0, 0, 2, 3),
    (-4.77403547e-6, 1, 0, 2, 3),
    (1.73825715e-6, 0, 1, 2, 3),
    (-4.09087898e-7, 0, 0, 3, 3),
    (6.14155345e-1, 0, 0, 0, 4),
    (-6.16755931e-2, 1, 0, 0, 4),
    (1.33374846e-3, 2, 0, 0, 4),
    (3.55375387e-3, 0, 1, 0, 4),
    (-5.13027851e-4, 1, 1, 0, 4),
    (1.02449757e-4, 0, 2, 0, 4),
    (-1.48526421e-3, 0, 0, 1, 4),
    (-4.11469183e-5, 1, 0, 1, 4),
    (-6.80434415e-6, 0, 1, 1, 4),
    (-9.77675906e-6, 0, 0, 2, 4),
    (8.82773108e-2, 0, 0, 0, 5),
    (-3.01859306e-3, 1, 0, 0, 5),
    (1.04452989e-3, 0, 1, 0, 5),
    (2.47090539e-4, 0, 0, 1, 5),
    (1.48348065e-3, 0, 0, 0, 6),
  )

  /** Both engines sum the 210 terms in 32-term left-assoc chunks, then sum
    * the chunk subtotals left-assoc: identical IEEE operation tree, and the
    * parse depth stays under external engines' expression-depth limits. */
  private val ChunkSize = 32

  /** The UTCI offset polynomial: inputs tas degC, wind m/s (10 m),
    * dt = mrt - tas in K, pa = water vapour partial pressure kPa. */
  def utciPoly(tas: Column, va: Column, dt: Column, pa: Column): Column =
    terms.map { case (c, i, j, k, l) =>
      var e: Column = lit(c)
      (0 until i).foreach(_ => e = e * tas)
      (0 until j).foreach(_ => e = e * va)
      (0 until k).foreach(_ => e = e * dt)
      (0 until l).foreach(_ => e = e * pa)
      e
    }.grouped(ChunkSize).map(_.reduceLeft(_ + _))
      .foldLeft(tas)(_ + _) // ((tas + chunk1) + chunk2) + … like the SQL twin

  /** SQL twin of [[utciPoly]] (same term order, same associativity). */
  def utciPolySql(tas: String, va: String, dt: String, pa: String): String =
    tas + " + " + terms.map { case (c, i, j, k, l) =>
      val f = new java.lang.StringBuilder(f"$c%.17e")
      (0 until i).foreach(_ => f.append("*").append(tas))
      (0 until j).foreach(_ => f.append("*").append(va))
      (0 until k).foreach(_ => f.append("*").append(dt))
      (0 until l).foreach(_ => f.append("*").append(pa))
      f.toString
    }.grouped(ChunkSize).map(_.mkString("(", " + ", ")")).mkString(" + ")

  /** ITS-90 saturation vapour pressure over water [Pa], tas in K
    * (converters.py:432, method="its90"). */
  def saturationVaporPressureIts90(tasK: Column): Column =
    exp(lit(-2836.5744) / (tasK * tasK) - lit(6028.076559) / tasK
      + lit(19.54263612) - lit(2.737830188e-2) * tasK
      + lit(1.6261698e-5) * tasK * tasK
      + lit(7.0229056e-10) * tasK * tasK * tasK
      - lit(1.8680009e-13) * tasK * tasK * tasK * tasK
      + lit(2.7150305) * log(tasK))

  /** SQL twin of [[saturationVaporPressureIts90]]. */
  def satVpIts90Sql(tasK: String): String =
    s"exp(-2836.5744/($tasK*$tasK) - 6028.076559/$tasK + 19.54263612" +
      s" - 2.737830188e-2*$tasK + 1.6261698e-5*$tasK*$tasK" +
      s" + 7.0229056e-10*$tasK*$tasK*$tasK - 1.8680009e-13*$tasK*$tasK*$tasK*$tasK" +
      s" + 2.7150305*ln($tasK))"

  /** Scalar twin of [[utciPoly]] — the SAME 32-term-chunked left-assoc
    * operation order, evaluated in one JIT-compiled loop. The Column form
    * builds a 1000+-node expression tree that blows past whole-stage
    * codegen's method limits (falling back to interpreted eval and
    * spending seconds in the optimizer); this static call keeps the plan
    * tree at one node. Invoked by the native [[UtciOffset]] expression. */
  def utciOffset(tas: Double, va: Double, dt: Double, pa: Double): Double = {
    var total = tas
    var idx = 0
    val n = terms.length
    while (idx < n) {
      var chunk = 0.0
      var first = true
      val end = math.min(idx + ChunkSize, n)
      while (idx < end) {
        val (c, i, j, k, l) = terms(idx)
        var e = c
        var r = 0
        while (r < i) { e *= tas; r += 1 }; r = 0
        while (r < j) { e *= va; r += 1 }; r = 0
        while (r < k) { e *= dt; r += 1 }; r = 0
        while (r < l) { e *= pa; r += 1 }
        chunk = if (first) e else chunk + e
        first = false
        idx += 1
      }
      total += chunk
    }
    total
  }

  /** UTCI [degC] with the reference's default invalid-input mask:
    * null outside -50<tas<50, -30<mrt-tas<30, 0.5<=wind<17. `hurs` is a
    * 0-1 fraction; mrt/tas degC. */
  def utci(tasC: Column, hursFrac: Column, windMs: Column, mrtC: Column): Column = {
    val dt = mrtC - tasC
    val pa = saturationVaporPressureIts90(tasC + 273.15) / 1000.0 * hursFrac
    when(tasC > -50.0 && tasC < 50.0 && dt > -30.0 && dt < 30.0 &&
      windMs >= 0.5 && windMs < 17.0,
      UtciOffset.column(tasC, windMs, dt, pa))
  }

  /** Sunlit-average cosine of the solar zenith angle over a day: the closed
    * form (hss sinLat sinDec + cosLat cosDec sin hss) / hss
    * (helpers.py:440 `cosine_of_solar_zenith_angle`, stat="average",
    * sunlit=True, collapsed to the daily sunlit window). */
  def cosZenithSunlitAvg(latDeg: Column, date: Column): Column = {
    val da = Evapotranspiration.dayAngle(date)
    val decl = Evapotranspiration.solarDeclinationSpencer(da)
    val latR = radians(latDeg)
    val hss = Evapotranspiration.sunsetHourAngle(latR, decl)
    when(hss > 0.0,
      (hss * sin(latR) * sin(decl) + cos(latR) * cos(decl) * sin(hss)) / hss)
      .otherwise(0.0)
  }

  /** Direct-beam fraction of global shortwave (converters.py:2495
    * `_fdir_ratio`): s* = rsds/(1367 csza dr), capped 0.85; ratio =
    * exp(3 - 1.34 s* - 1.65/s*), capped 0.9, zeroed for dark/low sun. */
  def fdirRatio(rsds: Column, csza: Column, eccentricity: Column): Column = {
    val sStar = least(rsds / (lit(1367.0) * csza * eccentricity), lit(0.85))
    val ratio = least(exp(lit(3.0) - lit(1.34) * sStar - lit(1.65) / sStar), lit(0.9))
    // dark test first: the branches below divide by csza/sStar (ANSI-safe
    // only because CaseWhen evaluates lazily)
    when(csza <= math.cos(89.5 / 180.0 * math.Pi) || rsds <= 0.0, 0.0)
      .otherwise(when(ratio <= 0.0, 0.0).otherwise(ratio))
  }

  /** Staged [[meanRadiantTemperature]]: materialises the solar
    * intermediates (day angle, declination, csza, eccentricity, fdir) as
    * their own projection columns before the final formula. The inlined
    * Column form repeats the Spencer trig chain once per reference (~5x
    * csza, 2x fdir) and conditional branches defeat codegen's common-
    * subexpression elimination — staging runs the trig once per row.
    * Adds `as` [K] to the frame; same values as the inline form. */
  def withMeanRadiantTemperature(df: org.apache.spark.sql.DataFrame,
                                 rsds: Column, rsus: Column, rlds: Column, rlus: Column,
                                 latDeg: Column, date: Column,
                                 as: String): org.apache.spark.sql.DataFrame = {
    val da = Evapotranspiration.dayAngle(date)
    val staged = df
      .withColumn("_ecc", Evapotranspiration.eccentricityCorrection(da))
      .withColumn("_csza", cosZenithSunlitAvg(latDeg, date))
      .withColumn("_fdir", fdirRatio(rsds, col("_csza"), col("_ecc")))
      .withColumn("_gamma", asin(col("_csza")))
    val rsdsDirect = col("_fdir") * rsds
    val fp = lit(0.308) * cos(col("_gamma") * 0.988 - col("_gamma") * col("_gamma") / 50000.0)
    val iStar = when(col("_csza") > 0.001, rsdsDirect / col("_csza")).otherwise(0.0)
    staged
      .withColumn(as, pow(
        lit(1.0 / 5.67e-8) * (lit(0.5) * rlds + lit(0.5) * rlus +
          lit(0.7 / 0.97) * (lit(0.5) * (rsds - rsdsDirect) + lit(0.5) * rsus + fp * iStar)),
        0.25))
      .drop("_ecc", "_csza", "_fdir", "_gamma")
  }

  /** Mean radiant temperature [K] (converters.py:2538): partition global
    * shortwave into direct/diffuse via [[fdirRatio]], project the direct
    * beam (fp factor), Stefan-Boltzmann-invert the absorbed flux. All
    * radiative fluxes W m-2; csza from [[cosZenithSunlitAvg]]. */
  def meanRadiantTemperature(rsds: Column, rsus: Column, rlds: Column, rlus: Column,
                             latDeg: Column, date: Column): Column = {
    val ecc = Evapotranspiration.eccentricityCorrection(Evapotranspiration.dayAngle(date))
    val csza = cosZenithSunlitAvg(latDeg, date)
    val fdir = fdirRatio(rsds, csza, ecc)
    val rsdsDirect = fdir * rsds
    val rsdsDiffuse = rsds - rsdsDirect
    val gamma = asin(csza)
    val fp = lit(0.308) * cos(gamma * 0.988 - gamma * gamma / 50000.0)
    val iStar = when(csza > 0.001, rsdsDirect / csza).otherwise(0.0)
    pow(
      lit(1.0 / 5.67e-8) * (lit(0.5) * rlds + lit(0.5) * rlus +
        lit(0.7 / 0.97) * (lit(0.5) * rsdsDiffuse + lit(0.5) * rsus + fp * iStar)),
      0.25)
  }
}

/** utci_offset(tas, va, dt, pa): the Broede polynomial as ONE plan node —
  * nullSafeEval and codegen both dispatch to the static
  * `Utci.utciOffset` loop (op-order-identical to the SQL twin). */
case class UtciOffset(first: org.apache.spark.sql.catalyst.expressions.Expression,
                      second: org.apache.spark.sql.catalyst.expressions.Expression,
                      third: org.apache.spark.sql.catalyst.expressions.Expression,
                      fourth: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  import org.apache.spark.sql.types.{DataType, DoubleType}
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(t: Any, v: Any, d: Any, p: Any): Any =
    Utci.utciOffset(t.asInstanceOf[Double], v.asInstanceOf[Double],
      d.asInstanceOf[Double], p.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (t, v, d, p) =>
      s"graft.indices.Utci.utciOffset($t, $v, $d, $p)")
  override protected def withNewChildrenInternal(
      f: org.apache.spark.sql.catalyst.expressions.Expression,
      s: org.apache.spark.sql.catalyst.expressions.Expression,
      t: org.apache.spark.sql.catalyst.expressions.Expression,
      q: org.apache.spark.sql.catalyst.expressions.Expression): UtciOffset =
    copy(first = f, second = s, third = t, fourth = q)
}

object UtciOffset {
  import org.apache.spark.sql.graft.ColumnBridge
  def column(tas: org.apache.spark.sql.Column, va: org.apache.spark.sql.Column,
             dt: org.apache.spark.sql.Column, pa: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    ColumnBridge.column(UtciOffset(ColumnBridge.expression(tas),
      ColumnBridge.expression(va), ColumnBridge.expression(dt),
      ColumnBridge.expression(pa)))
}
