package graft.indices

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Agrometeorology (`xclim/indices/_agro.py`): crop heat accumulation and
  * chill models. The hourly-input models compose with
  * `Converters.hourlyTemperature` (explode generator), then reduce with a
  * plain period aggregate — the whole pipeline stays declarative.
  */
object Agro {

  /** Corn heat units (_agro.py:69, Ontario CHU formula): daily value from
    * (tasmin, tasmax) in degC; negative half-terms floor at 0. */
  def cornHeatUnits(tasminC: Column, tasmaxC: Column): Column = {
    val ymin = greatest(lit(0.0), lit(1.8) * (tasminC - 4.44))
    val ymax = greatest(lit(0.0),
      lit(3.33) * (tasmaxC - 10.0) - lit(0.084) * pow(tasmaxC - 10.0, 2))
    (ymin + ymax) / 2.0
  }

  /** Utah-model chill weight for one hourly temperature in degC
    * (_agro.py:1538 `chill_units`, Richardson et al. 1974 bands). */
  def utahChillWeight(tasC: Column): Column =
    when(tasC <= 1.4, 0.0)
      .when(tasC <= 2.4, 0.5)
      .when(tasC <= 9.1, 1.0)
      .when(tasC <= 12.4, 0.5)
      .when(tasC <= 15.9, 0.0)
      .when(tasC <= 18.0, -0.5)
      .otherwise(-1.0)

  /** Utah chill units per entity: daily (tasmin, tasmax) degC -> hourly
    * sine/decay curve -> summed hourly chill weights. */
  def chillUnitsUtah(daily: DataFrame, keys: Seq[String],
                     tasmin: String = "tasmin", tasmax: String = "tasmax"): DataFrame =
    Converters.hourlyTemperature(daily, tasmin, tasmax)
      .groupBy(keys.map(col): _*)
      .agg(sum(utahChillWeight(col("tas_hourly"))).as("chill_units"))

  /** Latitude-temperature index (_agro.py:728): mean warmest-month temp
    * scaled by a latitude factor (lat in degrees). */
  def latitudeTemperatureIndex(meanWarmestMonthC: Column, latDeg: Column,
                               latFactor: Double = 75.0): Column =
    meanWarmestMonthC * (lit(latFactor) - abs(latDeg)) / lit(latFactor)
}
