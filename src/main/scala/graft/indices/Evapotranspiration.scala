package graft.indices

import graft.core.Time
import graft.functions.SpecialFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Potential evapotranspiration and the SPEI pipeline — the engine's
  * equivalent of `converters.py:1890 potential_evapotranspiration` (methods
  * BR65 / HG85 / MB05 / TW48 / DA02 / FAO_PM98), the solar geometry helpers
  * it rests on (`helpers.py:119 solar_declination`, `:195
  * eccentricity_correction_factor`, `:400 extraterrestrial_solar_radiation`,
  * `:450 day_lengths`), and `_agro.py:1148
  * standardized_precipitation_evapotranspiration_index`.
  *
  * Everything scalar is a pure codegen'd Column expression — the daily PET
  * methods cost a projection, nothing more, at any scale. The monthly
  * methods (TW48, DA02) and SPEI are declarative resample + window +
  * broadcast-join plans: two shuffles total (monthly rollup, per-pool fit),
  * identical at 100 TB.
  *
  * Angles are radians internally; temperatures degC; PET in mm/day (daily
  * methods) or mm/month (monthly methods).
  */
object Evapotranspiration {

  /** Day angle [rad]: fraction of the (leap-aware) year elapsed at the start
    * of `date`, times 2π (helpers.py:95 `day_angle`). */
  def dayAngle(date: Column): Column = {
    val diy = dayofyear(make_date(year(date), lit(12), lit(31)))
    lit(2.0 * math.Pi) * (dayofyear(date) - 1).cast("double") / diy.cast("double")
  }

  /** Solar declination [rad], Spencer (1971) 7-term Fourier series
    * (helpers.py:119, method="spencer"). */
  def solarDeclinationSpencer(da: Column): Column =
    lit(0.006918) - lit(0.399912) * cos(da) + lit(0.070257) * sin(da) -
      lit(0.006758) * cos(da * 2) + lit(0.000907) * sin(da * 2) -
      lit(0.002697) * cos(da * 3) + lit(0.001480) * sin(da * 3)

  /** Eccentricity correction factor [-], Spencer 5-term (helpers.py:195). */
  def eccentricityCorrection(da: Column): Column =
    lit(1.0001100) + lit(0.034221) * cos(da) + lit(0.001280) * sin(da) +
      lit(0.000719) * cos(da * 2) + lit(0.000077) * sin(da * 2)

  /** Sunset hour angle [rad], clamped for polar day (π) / night (0). */
  def sunsetHourAngle(latRad: Column, decl: Column): Column =
    acos(greatest(lit(-1.0), least(lit(1.0), -tan(latRad) * tan(decl))))

  /** Daily extraterrestrial solar radiation [J m-2 d-1]
    * (helpers.py:400): Gsc · dr · (ω_s sinφ sinδ + cosφ cosδ sin ω_s) / π,
    * the sunlit integral of the cosine of the solar zenith angle. */
  def extraterrestrialRadiation(latDeg: Column, date: Column,
                                gscWm2: Double = 1361.0): Column = {
    val da = dayAngle(date)
    val decl = solarDeclinationSpencer(da)
    val latR = radians(latDeg)
    val hss = sunsetHourAngle(latR, decl)
    lit(gscWm2 * 86400.0 / math.Pi) * eccentricityCorrection(da) *
      (hss * sin(latR) * sin(decl) + cos(latR) * cos(decl) * sin(hss))
  }

  /** Astronomical day length [h] with the Spencer declination
    * (helpers.py:450 `day_lengths`). */
  def dayLengthSpencer(latDeg: Column, date: Column): Column =
    lit(24.0 / math.Pi) * sunsetHourAngle(radians(latDeg),
      solarDeclinationSpencer(dayAngle(date)))

  /** PET Baier & Robertson (1965) [mm/day] (converters.py:2000, "BR65"):
    * 0.094·(−87.03 + 0.928·Tmax°F + 0.933·(Tmax−Tmin)°F + 0.0486·Ra_cal),
    * clipped at 0; Ra in cal cm-2 day-1 (1 cal/cm² = 41840 J/m²). */
  def petBaierRobertson65(tasminC: Column, tasmaxC: Column,
                          latDeg: Column, date: Column): Column = {
    val tminF = tasminC * 1.8 + 32.0
    val tmaxF = tasmaxC * 1.8 + 32.0
    val reCal = extraterrestrialRadiation(latDeg, date) / 41840.0
    greatest(lit(0.0),
      lit(0.094) * (lit(-87.03) + lit(0.928) * tmaxF +
        lit(0.933) * (tmaxF - tminF) + lit(0.0486) * reCal))
  }

  /** PET Hargreaves & Samani (1985) [mm/day] (converters.py:2011, "HG85"):
    * 0.0023 · (0.408·Ra_MJ) · (T + 17.8) · √(Tmax−Tmin), clipped at 0. */
  def petHargreaves85(tasminC: Column, tasmaxC: Column,
                      latDeg: Column, date: Column): Column = {
    val tas = (tasminC + tasmaxC) / 2.0
    val raMm = extraterrestrialRadiation(latDeg, date) / 1e6 * 0.408
    greatest(lit(0.0),
      lit(0.0023) * raMm * (tas + 17.8) *
        sqrt(greatest(tasmaxC - tasminC, lit(0.0))))
  }

  /** PET McGuinness & Bordne (2005 calibration) [mm/day]
    * (converters.py:2060, "MB05"): Ra/λ · (a·T + b) with
    * λ = 4185.5·(751.78 − 0.5655·T_K) J/kg and the 1367 W/m² solar
    * constant; a, b default to the UK calibration of the reference. */
  def petMcGuinnessBordne05(tasC: Column, latDeg: Column, date: Column,
                            a: Double = 0.00516409319477,
                            b: Double = 0.0874972822289): Column = {
    val ra = extraterrestrialRadiation(latDeg, date, gscWm2 = 1367.0)
    val latentH = lit(4185.5) * (lit(751.78) - lit(0.5655) * (tasC + 273.15))
    ra / latentH * (lit(a) * tasC + lit(b))
  }

  /** FAO-56 log-profile wind height conversion to 2 m
    * (converters.py:1761 `wind_speed_height_conversion`). */
  def windSpeed2m(windAtH: Column, hMeters: Double = 10.0): Column =
    windAtH * 4.87 / math.log(67.8 * hMeters - 5.42)

  /** PET FAO-56 Penman-Monteith (Allen 1998) [mm/day]
    * (converters.py:1825 `fao_allen98`, :2116 "FAO_PM98"): inputs are daily
    * Tmin/Tmax [degC], relative humidity [0-1], net radiation
    * [MJ m-2 day-1] and wind at 2 m [m/s]. */
  def petFaoAllen98(tasminC: Column, tasmaxC: Column, hursFrac: Column,
                    netRadMj: Column, wind2m: Column): Column = {
    val tasM = (tasminC + tasmaxC) / 2.0
    // saturation vapour pressure in kPa (Magnus, hPa / 10)
    val es = (Converters.saturationVaporPressure(tasmaxC) +
      Converters.saturationVaporPressure(tasminC)) / 2.0 / 10.0
    val ea = es * hursFrac
    val delta = lit(4098.0) * es / ((tasM + 237.3) * (tasM + 237.3))
    val gamma = 0.665e-3 * 101.325
    val a1 = lit(0.408) * delta * netRadMj
    val a2 = lit(gamma) * 900.0 / (tasM + 273.15) * wind2m * (es - ea)
    val a3 = delta + lit(gamma) * (lit(1.0) + lit(0.34) * wind2m)
    (a1 + a2) / a3
  }

  /** PET Thornthwaite (1948) [mm/month] (converters.py:2082, "TW48").
    * Input: a daily frame with (keys..., dateCol, tasCol [degC], latCol).
    * Plan: monthly rollup → yearly heat-index broadcast join → projection;
    * output one row per (keys, month period start).
    */
  def petThornthwaite48(daily: DataFrame, keys: Seq[String], dateCol: String,
                        tasCol: String, latCol: String, quantize: Int = -1): DataFrame = {
    val k = keys.map(col)
    def q(c: Column, extra: Int = 0): Column =
      if (quantize >= 0) Distributions.qGrid(c, quantize + extra) else c
    val month0 = Time.resamplePeriod(col(dateCol).cast("timestamp"), "MS").as("m")
    // monthly mean of clip(tas, 0) and of day length / 12
    val monthly = daily
      .withColumn("_tasc", greatest(col(tasCol), lit(0.0)))
      .withColumn("_dl12", dayLengthSpencer(col(latCol), col(dateCol)) / 12.0)
      .groupBy((k :+ month0): _*)
      .agg(q(avg(col("_tasc"))).as("tas_m"), q(avg(col("_dl12"))).as("dl_m"))
    // annual heat index I = Σ_months (tas_m/5)^1.514 and its cubic exponent a
    // q() quantizes every transcendental output (pow) before it propagates:
    // JVM Math.pow and an external oracle's libm can differ in the last ulp,
    // and the cubic is evaluated with exact multiplies for the same reason.
    val yearly = monthly
      .groupBy((k :+ year(col("m")).as("y")): _*)
      .agg(q(sum(q(pow(col("tas_m") / 5.0, 1.514), 2)), 0).as("hi"))
      .withColumn("a", lit(6.75e-7) * col("hi") * col("hi") * col("hi") -
        lit(7.71e-5) * col("hi") * col("hi") + lit(0.01791) * col("hi") + lit(0.49239))
    monthly
      .withColumn("y", year(col("m")))
      .join(broadcast(yearly), keys :+ "y")
      .withColumn("pet_mm",
        when(col("hi") > 0,
          lit(16.0) * col("dl_m") *
            q(pow(lit(10.0) * col("tas_m") / col("hi"), col("a")), 1))
          .otherwise(0.0))
      .select((k :+ col("m") :+ col("pet_mm")): _*)
  }

  /** SPEI (_agro.py:1148): water budget `wb = pr − pet` resampled monthly,
    * rolling `window`-month mean, pooled by calendar month, fitted with the
    * two-parameter log-logistic (fisk) via the reference's APP closed form
    * (stats.py:653 `_fit_start`: scale = 2m³/(m₂+m²),
    * c = πm/(√3·√(m₂−m²)) on x−floc), CDF'd and probit-transformed, clipped
    * to ±8.21. `floc` is the user-fixed location the APP method requires.
    *
    * Two shuffles (monthly rollup + per-pool fit broadcast back); the probit
    * is the native codegen'd expression.
    */
  def spei(daily: DataFrame, keys: Seq[String], dateCol: String, wbCol: String,
           window: Int, floc: Double, quantize: Int = -1): DataFrame = {
    val k = keys.map(col)
    // `quantize` >= 0 rounds the monthly means and the fit moments to that
    // many digits — pins down float-summation order so an external oracle
    // computing the same pipeline hashes identically; -1 = off.
    def q(c: Column, extra: Int = 0): Column =
      if (quantize >= 0) Distributions.qGrid(c, quantize + extra) else c
    val monthly = daily
      .groupBy((k :+ Time.resamplePeriod(col(dateCol).cast("timestamp"), "MS").as("m")): _*)
      .agg(q(avg(col(wbCol))).as("wb"))
    val w = Window.partitionBy(k: _*).orderBy(col("m"))
    val rolled =
      if (window <= 1) monthly
      else monthly
        .withColumn("_rn", row_number().over(w))
        .withColumn("wb", avg(col("wb")).over(w.rowsBetween(-(window - 1), 0)))
        .filter(col("_rn") >= window).drop("_rn")
    val pooled = rolled.withColumn("pool", month(col("m")))
    val x = col("wb") - floc
    val fit = pooled
      .filter(x > 0)
      .groupBy((k :+ col("pool")): _*)
      .agg(q(avg(x), 2).as("m1"), q(avg(x * x), 2).as("m2"))
      .withColumn("scale", lit(2.0) * pow(col("m1"), 3) / (col("m2") + col("m1") * col("m1")))
      .withColumn("c", lit(math.Pi) * col("m1") /
        (sqrt(lit(3.0)) * sqrt(col("m2") - col("m1") * col("m1"))))
      .select((k :+ col("pool") :+ col("scale") :+ col("c")): _*)
    val cdf = lit(1.0) / (lit(1.0) + pow(x / col("scale"), -col("c")))
    pooled.join(broadcast(fit), keys :+ "pool")
      .withColumn("spei",
        when(x <= 0, lit(-8.21)).otherwise(
          greatest(least(SpecialFunctions.probit(cdf), lit(8.21)), lit(-8.21))))
      .select((k :+ col("m") :+ col("wb") :+ col("spei")): _*)
  }
}
