package graft.indices

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Agrometeorology (`xclim/indices/_agro.py`): crop heat accumulation and
  * chill models. The hourly-input models compose with
  * `Converters.hourlyTemperature` (explode generator), then reduce with a
  * plain period aggregate — the whole pipeline stays declarative.
  */
object Agro {

  /** `corn_heat_units` (_agro.py:69, Ontario CHU formula): daily value from
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
    * sine/decay curve -> summed hourly chill weights. `positiveOnly`
    * clamps the negative (chill-negating) bands to 0, the reference's
    * `chill_units(positive_only=True)` option (_agro.py:1538). */
  def chillUnitsUtah(daily: DataFrame, keys: Seq[String],
                     tasmin: String = "tasmin", tasmax: String = "tasmax",
                     positiveOnly: Boolean = false): DataFrame = {
    val w0 = utahChillWeight(col("tas_hourly"))
    val w = if (positiveOnly) greatest(w0, lit(0.0)) else w0
    Converters.hourlyTemperature(daily, tasmin, tasmax)
      .groupBy(keys.map(col): _*)
      .agg(sum(w).as("chill_units"))
  }

  /** Chill portions after the Dynamic Model (_agro.py:1442
    * `_chill_portion_one_season`, Fishman 1987 / Luedeling 2009 constants).
    * Strictly sequential two-compartment recursion over an ordered
    * temperature series: the intermediate product x accumulates towards the
    * equilibrium xs with rate ak1 and, once x >= 1, the fraction xi is
    * banked as a chill portion. Input frame: (key LONG, t INT order,
    * v DOUBLE = temperature K); output (key, t, chill_portions) with the
    * running total per step (period total = max per period). Runs as a
    * per-key sorted scan — linear, one shuffle, state is 3 doubles. */
  def chillPortionsDynamic(series: DataFrame): DataFrame = {
    final case class St(interE: Double, xi: Double, total: Double, started: Boolean)
    val E0 = 4153.5; val E1 = 12888.8; val A0 = 139500.0; val A1 = 2.567e18
    val SLP = 1.6; val TETMLT = 277.0
    val AA = A0 / A1; val EE = E1 - E0
    // per-step HALF_UP quantization at 8 decimals (the Fire-kernel pattern)
    // so libm-vs-JVM exp ulp differences cannot drift the recursion vs a
    // step-identical SQL oracle
    def q8(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    graft.plans.Recursive.scanPerKeyState(series, St(0.0, 0.0, 0.0, started = false)) {
      (st, tasK, _) =>
        val sr = math.exp(SLP * TETMLT * (tasK - TETMLT) / tasK)
        val xi = q8(sr / (1.0 + sr))
        if (!st.started) St(0.0, xi, 0.0, started = true) // inter_E[0] = 0
        else {
          val xs = AA * math.exp(EE / tasK)
          val ak1 = A1 * math.exp(-E1 / tasK)
          val sPrev = if (st.interE < 1.0) st.interE else st.interE - st.interE * st.xi
          val interE = q8(xs - (xs - sPrev) * math.exp(-ak1))
          val delta = if (interE >= 1.0) interE * xi else 0.0
          St(interE, xi, q8(st.total + delta), started = true)
        }
    }(_.total).toDF("key", "t", "chill_portions")
  }

  /** `latitude_temperature_index` (_agro.py:728): mean warmest-month temp
    * scaled by a latitude factor (lat in degrees). */
  def latitudeTemperatureIndex(meanWarmestMonthC: Column, latDeg: Column,
                               latFactor: Double = 75.0): Column =
    meanWarmestMonthC * (lit(latFactor) - abs(latDeg)) / lit(latFactor)

  /** Dryness Index (_agro.py:532, Tonietto & Carbonneau 2004, northern
    * anchor): DI = Wo + sum over the Apr-Sep season of (P - Tv - Es) on
    * MONTHLY totals [mm], where k = 0.1 (Apr) / 0.3 (May) / 0.5 (Jun-Sep),
    * Tv = ETP k, Es = ETP/N (1-k) min(P/5, N), N = days in month. Input: a
    * monthly frame (keys, monthStart DATE, prMm, etpMm); one hash-agg. */
  def drynessIndex(monthly: DataFrame, keys: Seq[String], monthCol: String,
                   prMm: String, etpMm: String, woMm: Double = 200.0): DataFrame = {
    val m = month(col(monthCol))
    val k = when(m === 4, 0.1).when(m === 5, 0.3)
      .when(m >= 6 && m <= 9, 0.5).otherwise(0.0)
    val n = dayofmonth(last_day(col(monthCol))).cast("double")
    val prm = when(k > 0, col(prMm)).otherwise(0.0)
    val tv = col(etpMm) * k
    val es = col(etpMm) / n * (lit(1.0) - k) * least(prm / 5.0, n)
    monthly
      .withColumn("_w", prm - tv - es)
      .groupBy((keys.map(col) :+ year(col(monthCol)).as("y")): _*)
      .agg((lit(woMm) + sum(col("_w"))).as("dryness_index"))
  }

  /** Cool night index (_agro.py:447): mean tasmin of September (northern
    * anchor) per year. */
  def coolNightIndex(daily: DataFrame, keys: Seq[String], dateCol: String,
                     tasminC: String, anchorMonth: Int = 9): DataFrame =
    daily.filter(month(col(dateCol)) === anchorMonth)
      .groupBy((keys.map(col) :+ year(col(dateCol)).as("y")): _*)
      .agg(avg(col(tasminC)).as("cool_night_index"))

  /** Huglin heliothermal index (_agro.py:151, Huglin 1978): Apr-Sep sum of
    * k(lat) * max(0, ((tas - 10) + (tasmax - 10))/2), with the stepwise
    * day-length latitude coefficient (helpers.py:528, method="huglin"):
    * 1.0 up to |lat| 40, then 1.02/1.03/1.04/1.05/1.06 per 2-degree band
    * to 50, `capValue` beyond — huglin_day_length_latitude_coefficient.
    * Pure projection + one period hash-agg. */
  def huglinK(latDeg: Column, capValue: Double = 1.0): Column = {
    val a = abs(latDeg)
    when(a <= 40.0, 1.0).when(a <= 42.0, 1.02).when(a <= 44.0, 1.03)
      .when(a <= 46.0, 1.04).when(a <= 48.0, 1.05).when(a <= 50.0, 1.06)
      .otherwise(capValue)
  }

  def huglinIndex(daily: DataFrame, keys: Seq[String], dateCol: String,
                  tasC: String, tasmaxC: String, latDeg: String,
                  threshC: Double = 10.0, capValue: Double = 1.0): DataFrame = {
    val m = month(col(dateCol))
    val dd = greatest(lit(0.0),
      ((col(tasC) - threshC) + (col(tasmaxC) - threshC)) / 2.0)
    daily
      .withColumn("_hi",
        when(m >= 4 && m <= 9, huglinK(col(latDeg), capValue) * dd).otherwise(0.0))
      .groupBy((keys.map(col) :+ year(col(dateCol)).as("y")): _*)
      .agg(sum(col("_hi")).as("huglin_index"))
  }

  /** `rain_season` (_agro.py:796, Sivakumar 1998): per (keys, year), the
    * start / end / length of the rain season.
    *
    * Start: the first day on or after `startMonth`-01 that begins a
    * [[graft.core.Runs.runsWithHoles]] event of length >=
    * `windowWetStart + windowNotDryStart`, where the event turns on when the
    * trailing `windowWetStart`-day precipitation total reaches
    * `threshWetStart` and turns off after `windowDryStart` consecutive days
    * <= `threshDryStart` (the reference's per_day method).
    * End: the first day after the start (and on or after `endMonth`-01)
    * beginning a run of `windowDryEnd` consecutive days <= `threshDryEnd`.
    * Length: end - start days, or days to the last observed day of the year
    * + 1 when the season never ends.
    *
    * Two window passes over one (keys, year) partitioning (exchange reused)
    * + a broadcast of the one-row-per-entity-year start table: scale-safe.
    * Runs are over rows present, like every `Runs` operator.
    */
  def rainSeason(daily: DataFrame, keys: Seq[String], dateCol: String, prCol: String,
                 threshWetStart: Double = 25.0, windowWetStart: Int = 3,
                 windowNotDryStart: Int = 30,
                 threshDryStart: Double = 1.0, windowDryStart: Int = 7,
                 threshDryEnd: Double = 0.0, windowDryEnd: Int = 20,
                 startMonth: Int = 5, endMonth: Int = 9): DataFrame = {
    import graft.core.Runs
    val d = col(dateCol)
    val yKeys = keys :+ "y"
    val withY = daily.withColumn("y", year(d))
    // --- start: wet trigger / dry-hole state machine on the sliced series
    val sliced = withY.filter(month(d) >= startMonth)
    val wOrd = Window.partitionBy(yKeys.map(col): _*).orderBy(d)
    val wWet = wOrd.rowsBetween(-(windowWetStart - 1), 0)
    val wet = sliced
      .withColumn("_w3", sum(col(prCol)).over(wWet))
      .withColumn("_rn", row_number().over(wOrd))
    val daStart = col("_w3") >= threshWetStart && col("_rn") >= windowWetStart
    val events = Runs.runsWithHoles(wet, yKeys, d,
      daStart, 1, col(prCol) <= threshDryStart, windowDryStart)
    val starts = Runs.runTable(events, yKeys, d, col("in_event"))
      .filter(col("run_len") >= windowWetStart + windowNotDryStart)
      .groupBy(yKeys.map(col): _*)
      .agg(min(col("run_start")).as("start_d"))
    // --- end: first qualifying dry run strictly after the start
    val withStart = withY.join(broadcast(starts), yKeys)
    val dryRuns = Runs.runTable(withStart, yKeys, d,
        col(prCol) <= threshDryEnd && d > col("start_d"))
      .filter(col("run_len") >= windowDryEnd && month(col("run_start")) >= endMonth)
      .groupBy(yKeys.map(col): _*)
      .agg(min(col("run_start")).as("end_d"))
    val lastObs = withY.groupBy(yKeys.map(col): _*).agg(max(d).as("_last_d"))
    starts
      .join(broadcast(dryRuns), yKeys, "left")
      .join(broadcast(lastObs), yKeys)
      .select((yKeys.map(col) :+
        dayofyear(col("start_d")).as("rain_season_start") :+
        dayofyear(col("end_d")).as("rain_season_end") :+
        coalesce(datediff(col("end_d"), col("start_d")),
          datediff(col("_last_d"), col("start_d")) + 1).as("rain_season_length")): _*)
  }
}
