package graft.indicator

import graft.core.{Runs, Time}
import graft.indices.Generic
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Indicator registry (`xclim/core/indicator.py:281` `registry`) plus the
  * built-in generic compute bases that config-defined ("virtual")
  * indicators reference by name — the Spark twin of resolving `compute` from
  * `xclim.indices.generic` in `Indicator.from_dict` (indicator.py:788-795).
  */
object Registry {

  private val reg = scala.collection.concurrent.TrieMap.empty[String, Indicator]

  def register(i: Indicator): Indicator = { reg.put(i.spec.identifier, i); i }
  def apply(identifier: String): Indicator =
    reg.getOrElse(identifier, throw new NoSuchElementException(
      s"no indicator '$identifier'; known: ${reg.keys.toSeq.sorted.mkString(", ")}"))
  def get(identifier: String): Option[Indicator] = reg.get(identifier)
  def names: Seq[String] = reg.keys.toSeq.sorted

  /** Generic compute bases, keyed by the names configs may reference. Each
    * is (df, freq, params) -> (location_id, period, value). */
  val computeBases: Map[String, (DataFrame, String, Map[String, String]) => DataFrame] = Map(
    "resample_mean" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(avg(col(p.getOrElse("var", "value"))).as("value")))),
    "resample_max" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(max(col(p.getOrElse("var", "value"))).as("value")))),
    "resample_min" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(min(col(p.getOrElse("var", "value"))).as("value")))),
    "resample_sum" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(sum(col(p.getOrElse("var", "value"))).as("value")))),
    "threshold_count" -> ((df, freq, p) =>
      Generic.thresholdCount(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
        lit(p.getOrElse("thresh", "0").toDouble), "value")),
    "domain_count" -> ((df, freq, p) =>
      Generic.domainCount(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")),
        lit(p.getOrElse("low", "0").toDouble), lit(p.getOrElse("high", "0").toDouble), "value")),
    "cumulative_difference" -> ((df, freq, p) =>
      Generic.cumulativeDifference(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
        lit(p.getOrElse("thresh", "0").toDouble), "value")),
    "spell_length_max" -> ((df, freq, p) =>
      Generic.spellLengthStatistics(df, Seq("location_id"), col("time"), freq,
          Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
            lit(p.getOrElse("thresh", "0").toDouble)),
          "max", p.getOrElse("window", "1").toInt)
        .withColumnRenamed("run_max", "value")),
    "first_occurrence" -> ((df, freq, p) =>
      Generic.firstOccurrence(df, Seq("location_id"), col("time"), freq,
          Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
            lit(p.getOrElse("thresh", "0").toDouble)), "value")),
    "doy_percentile_count" -> ((df, freq, p) =>
      graft.indices.PercentileIndicators.doyExceedance(df, Seq("location_id"), "time",
        p.getOrElse("var", "value"), p.getOrElse("per", "0.9").toDouble,
        p.getOrElse("op", ">"), p.getOrElse("half_window", "2").toInt, freq,
        asPercent = p.getOrElse("percent", "false").toBoolean)),
    "doy_percentile_spell" -> ((df, freq, p) =>
      graft.indices.PercentileIndicators.doySpellDuration(df, Seq("location_id"), "time",
        p.getOrElse("var", "value"), p.getOrElse("per", "0.9").toDouble,
        p.getOrElse("op", ">"), p.getOrElse("half_window", "2").toInt,
        p.getOrElse("window", "6").toInt, freq)),
    // fraction of period days meeting the condition (wetdays_prop,
    // snowfall_frequency — _threshold.py:2792,:1878)
    "threshold_prop" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(avg(when(Generic.compare(col(p.getOrElse("var", "value")),
          p.getOrElse("op", ">"), lit(p.getOrElse("thresh", "0").toDouble)), 1.0)
          .otherwise(0.0)).as("value")))),
    // share of the period total carried by qualifying days (rprctot,
    // _threshold.py:2634)
    "threshold_sum_fraction" -> ((df, freq, p) => {
      val v = col(p.getOrElse("var", "value"))
      val cond = Generic.compare(v, p.getOrElse("op", ">="),
        lit(p.getOrElse("thresh", "0").toDouble))
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq((sum(when(cond, v)) / sum(v)).as("value")))
    }),
    // mean/sum/max/min of v over qualifying days (sdii _threshold.py:680,
    // snowfall_intensity :1925)
    "thresholded_stat" -> ((df, freq, p) =>
      Generic.thresholdedStat(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")),
        Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">="),
          lit(p.getOrElse("thresh", "0").toDouble)),
        p.getOrElse("reducer", "mean"), "value")),
    // rolling window reduce then period reduce (max_n_day_precipitation,
    // _simple.py:485)
    "rolling_resample" -> ((df, freq, p) =>
      Generic.rollingThenResample(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), p.getOrElse("window", "3").toInt,
        p.getOrElse("win_reducer", "sum"), p.getOrElse("reducer", "max"), "value")),
    // days whose day-over-day increase meets the threshold (snd_storm_days
    // _threshold.py:600, winter_storm :3003)
    "lag_diff_count" -> ((df, freq, p) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("location_id")).orderBy(col("time"))
      val v = col(p.getOrElse("var", "value"))
      val d = v - lag(v, 1).over(w)
      Generic.resampleOp(df.withColumn("_d", d), Seq("location_id"), col("time"), freq,
        Seq(coalesce(sum(when(Generic.compare(col("_d"), p.getOrElse("op", ">="),
          lit(p.getOrElse("thresh", "0").toDouble)), 1L)), lit(0L)).as("value")))
    }),
    // period max of the day-over-day DECREASE (snow_melt_we_max
    // _hydrology.py:696; negate for accumulation max)
    "lag_drop_max" -> ((df, freq, p) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("location_id")).orderBy(col("time"))
      val v = col(p.getOrElse("var", "value"))
      Generic.resampleOp(df.withColumn("_d", lag(v, 1).over(w) - v),
        Seq("location_id"), col("time"), freq, Seq(max(col("_d")).as("value")))
    }),
    "last_occurrence" -> ((df, freq, p) =>
      Generic.lastOccurrence(df, Seq("location_id"), col("time"), freq,
          Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
            lit(p.getOrElse("thresh", "0").toDouble)), "value")),
    "doy_of_max" -> ((df, freq, p) =>
      Generic.doyOfExtreme(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), maximum = true, "value")),
    "doy_of_min" -> ((df, freq, p) =>
      Generic.doyOfExtreme(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), maximum = false, "value")),
    // spell-length statistic with a selectable reducer (cold_spell_days,
    // hot_spell_frequency, dry/wet_spell_* — generic.py:589 family)
    "spell_stat" -> ((df, freq, p) => {
      val red = p.getOrElse("reducer", "max")
      Generic.spellLengthStatistics(df, Seq("location_id"), col("time"), freq,
          Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
            lit(p.getOrElse("thresh", "0").toDouble)),
          red, p.getOrElse("window", "1").toInt)
        .withColumnRenamed(s"run_$red", "value")
    }),
    // spells qualified on BOTH variables (heat_wave_* — _multivariate.py:170)
    "bivariate_spell_stat" -> ((df, freq, p) => {
      val red = p.getOrElse("reducer", "max")
      val cond =
        Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
          lit(p.getOrElse("thresh", "0").toDouble)) &&
        Generic.compare(col(p.getOrElse("var2", "value2")), p.getOrElse("op2", ">"),
          lit(p.getOrElse("thresh2", "0").toDouble))
      Generic.spellLengthStatistics(df, Seq("location_id"), col("time"), freq,
          cond, red, p.getOrElse("window", "1").toInt)
        .withColumnRenamed(s"run_$red", "value")
    }),
    // bivariate_count_occurrences — days qualifying on BOTH variables
    // (generic.py:1003; rain_on_frozen_ground
    // _multivariate.py:944, cold_and_dry quadrants :252-426,
    // tx_tn_days_above :1604)
    "bivariate_count" -> ((df, freq, p) => {
      val cond =
        Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
          lit(p.getOrElse("thresh", "0").toDouble)) &&
        Generic.compare(col(p.getOrElse("var2", "value2")), p.getOrElse("op2", ">"),
          lit(p.getOrElse("thresh2", "0").toDouble))
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(coalesce(sum(when(cond, 1L)), lit(0L)).as("value")))
    }),
    // season bounds per calendar year with a mid-date qualifier
    // (growing_season_length _threshold.py:1096, frost/snow season families)
    "season_bound" -> ((df, freq, p) => {
      val cond = Generic.compare(col(p.getOrElse("var", "value")),
        p.getOrElse("op", ">="), lit(p.getOrElse("thresh", "0").toDouble))
      val mid = make_date(year(col("time")),
        lit(p.getOrElse("mid_month", "7").toInt), lit(p.getOrElse("mid_day", "1").toInt))
      val withY = df.withColumn("_y", year(col("time")))
        .withColumn("_date", col("time").cast("date"))
      val bounds = graft.indices.Season.seasonBounds(withY,
        Seq("location_id", "_y"), col("_date"), cond,
        p.getOrElse("window", "6").toInt, mid)
      val out = p.getOrElse("bound", "length") match {
        case "start"  => dayofyear(col("season_start"))
        case "end"    => dayofyear(col("season_end"))
        case "length" => col("season_length")
      }
      bounds.select(col("location_id"), col("_y").as("period"), out.as("value"))
    }),
    // isothermality (_anuclim.py:51): mean diurnal range / extreme range
    // x100; needs varmin/varmax columns
    "isothermality" -> ((df, freq, p) => {
      val vmin = col(p.getOrElse("varmin", "valuemin"))
      val vmax = col(p.getOrElse("varmax", "valuemax"))
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq((avg(vmax - vmin) / (max(vmax) - min(vmin)) * 100.0).as("value")))
    }),
    // extreme temperature range ETR (generic.py:1388): value=tasmax,
    // value2=tasmin
    "etr" -> ((df, freq, p) =>
      Generic.extremeRange(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), col(p.getOrElse("var2", "value2")), "value")),
    // mean daily temperature range DTR (_multivariate.py:615)
    "daily_range_mean" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(avg(col(p.getOrElse("var", "value")) - col(p.getOrElse("var2", "value2")))
          .as("value")))),
    // maxdtr (cf catalogue): period max of the daily range
    "daily_range_max" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(max(col(p.getOrElse("var", "value")) - col(p.getOrElse("var2", "value2")))
          .as("value")))),
    // vDTR (_multivariate.py:675): mean |DTR_d - DTR_{d-1}|
    "daily_range_variability" -> ((df, freq, p) =>
      Generic.lagDiffStat(
        df.withColumn("_r", col(p.getOrElse("var", "value")) - col(p.getOrElse("var2", "value2"))),
        Seq("location_id"), col("time"), freq, col("_r"), "value")),
    // R75p family (icclim): days above the entity's base-period wet-day
    // percentile; exact type-7 percentile + broadcast join back
    "wetday_percentile_count" -> ((df, freq, p) => {
      val v = col(p.getOrElse("var", "value"))
      val wet = v >= lit(p.getOrElse("wet_thresh", "1.0").toDouble)
      val q = df.filter(wet).groupBy(col("location_id").as("_lid"))
        .agg(percentile(v, lit(p.getOrElse("per", "0.75").toDouble)).as("_q"))
      Generic.resampleOp(
        df.join(broadcast(q), col("location_id") === col("_lid")),
        Seq("location_id"), col("time"), freq,
        Seq(coalesce(sum(when(wet && v > col("_q"), 1L)), lit(0L)).as("value")))
    }),
    // RxxpTOT family (icclim): share of wet-day precip from days above the
    // wet-day percentile, x100
    "wetday_percentile_fraction" -> ((df, freq, p) => {
      val v = col(p.getOrElse("var", "value"))
      val wet = v >= lit(p.getOrElse("wet_thresh", "1.0").toDouble)
      val q = df.filter(wet).groupBy(col("location_id").as("_lid"))
        .agg(percentile(v, lit(p.getOrElse("per", "0.75").toDouble)).as("_q"))
      Generic.resampleOp(
        df.join(broadcast(q), col("location_id") === col("_lid")),
        Seq("location_id"), col("time"), freq,
        Seq((sum(when(wet && v > col("_q"), v)) / sum(when(wet, v)) * 100.0).as("value")))
    }),
    // CD/CW/WD/WW (icclim, _multivariate.py:252-426 with percentile
    // thresholds): tas side vs its whole-series percentile, pr side vs the
    // wet-day percentile (pr must also be wet)
    "quadrant_percentile_count" -> ((df, freq, p) => {
      val t = col(p.getOrElse("var", "value"))
      val pr = col(p.getOrElse("var2", "value2"))
      val wet = pr >= lit(p.getOrElse("wet_thresh", "1.0").toDouble)
      val q = df.groupBy(col("location_id").as("_lid")).agg(
        percentile(t, lit(p.getOrElse("per_t", "0.25").toDouble)).as("_qt"))
      val qp = df.filter(wet).groupBy(col("location_id").as("_lid2")).agg(
        percentile(pr, lit(p.getOrElse("per_p", "0.75").toDouble)).as("_qp"))
      val cond = Generic.compare(t, p.getOrElse("op_t", "<"), col("_qt")) &&
        wet && Generic.compare(pr, p.getOrElse("op_p", ">"), col("_qp"))
      Generic.resampleOp(
        df.join(broadcast(q), col("location_id") === col("_lid"))
          .join(broadcast(qp), col("location_id") === col("_lid2")),
        Seq("location_id"), col("time"), freq,
        Seq(coalesce(sum(when(cond, 1L)), lit(0L)).as("value")))
    }),
    // ANUCLIM seasonality CVs (_anuclim.py:105 P4/P15): coefficient of
    // variation of the monthly means (temperature) / totals (precip), x100
    "temp_seasonality_cv" -> ((df, freq, p) =>
      df.groupBy(col("location_id"),
          graft.core.Time.resamplePeriod(col("time"), "MS").as("_m"))
        .agg(avg(col(p.getOrElse("var", "value"))).as("_mv"))
        .groupBy(col("location_id"),
          graft.core.Time.resamplePeriod(col("_m"), freq).as("period"))
        .agg((stddev_pop(col("_mv")) / avg(col("_mv")) * 100.0).as("value"))),
    "precip_seasonality_cv" -> ((df, freq, p) =>
      df.groupBy(col("location_id"),
          graft.core.Time.resamplePeriod(col("time"), "MS").as("_m"))
        .agg(sum(col(p.getOrElse("var", "value"))).as("_mv"))
        .groupBy(col("location_id"),
          graft.core.Time.resamplePeriod(col("_m"), freq).as("period"))
        .agg((stddev_pop(col("_mv")) / avg(col("_mv")) * 100.0).as("value"))),
    // ANUCLIM quarter selection (_anuclim.py P8-P19): monthly rollup, 3-month
    // rolling windows, per-period argmax/argmin of the selector statistic,
    // returning the output statistic of the selected quarter. Ties resolve
    // to the earliest window (struct-ordered max_by/min_by).
    "quarter_select" -> ((df, freq, p) => {
      val selVar = col(p.getOrElse("sel_var", "value2"))
      val outVar = col(p.getOrElse("out_var", "value"))
      def monthlyAgg(kind: String, c: org.apache.spark.sql.Column) =
        if (kind == "sum") sum(c) else avg(c)
      val monthly = df.groupBy(col("location_id"),
          graft.core.Time.resamplePeriod(col("time"), "MS").as("_m"))
        .agg(monthlyAgg(p.getOrElse("sel_agg", "sum"), selVar).as("_sel"),
          monthlyAgg(p.getOrElse("out_agg", "mean"), outVar).as("_out"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("location_id")).orderBy(col("_m"))
      val w3 = w.rowsBetween(-2, 0)
      val windows = monthly
        .withColumn("_rn", row_number().over(w))
        .withColumn("_sel3", when(col("_rn") >= 3,
          monthlyAgg(p.getOrElse("sel_agg", "sum"), col("_sel")).over(w3)))
        .withColumn("_out3", when(col("_rn") >= 3,
          monthlyAgg(p.getOrElse("out_agg", "mean"), col("_out")).over(w3)))
        .filter(col("_sel3").isNotNull)
      val pick =
        if (p.getOrElse("sel_op", "max") == "max")
          max_by(col("_out3"), // earliest window wins ties
            struct(col("_sel3"), (lit(0L) - unix_timestamp(col("_m"))).as("_t")))
        else
          min_by(col("_out3"),
            struct(col("_sel3"), unix_timestamp(col("_m")).as("_t")))
      windows.groupBy(col("location_id"),
          graft.core.Time.resamplePeriod(col("_m"), freq).as("period"))
        .agg(pick.as("value"))
    }),
    // hot_spell_max_magnitude (_threshold.py:2019, Russo 2014): max over
    // spells >= window of the spell's summed exceedance (tasmax - thresh)
    "spell_max_magnitude" -> ((df, freq, p) => {
      val v = col(p.getOrElse("var", "value"))
      val thr = lit(p.getOrElse("thresh", "0").toDouble)
      val keyed = df.withColumn("period", graft.core.Time.resamplePeriod(col("time"), freq))
      graft.core.Runs.windowedMaxRunSum(keyed, Seq("location_id", "period"),
          col("time"), v > thr, greatest(v - thr, lit(0.0)),
          p.getOrElse("window", "3").toInt)
        .withColumnRenamed("max_run_sum", "value")
    }),
    // Spinoni 2018 degree-day approximations from the daily cycle
    // (_threshold.py:844 cooling, :2070 heating). Inputs: value=tas,
    // valuemax=tasmax, valuemin=tasmin.
    "dd_approximation" -> ((df, freq, p) => {
      val daily = ddApproxDaily(col(p.getOrElse("var", "value")),
        col(p.getOrElse("varmax", "valuemax")),
        col(p.getOrElse("varmin", "valuemin")),
        lit(p.getOrElse("thresh", "291.15").toDouble),
        p.getOrElse("kind", "cooling"))
      Generic.resampleOp(df.withColumn("_dd", daily), Seq("location_id"),
        col("time"), freq, Seq(sum(col("_dd")).as("value")))
    }),
    // holiday_snow_days / holiday_snow_and_snowfall_days
    // (_threshold.py:3743,:3799): count of qualifying days inside a fixed
    // month-day window (pure calendar predicate — partition-prunable)
    "holiday_count" -> ((df, freq, p) => {
      val md = month(col("time")) * 100 + dayofmonth(col("time"))
      val lo = p.getOrElse("date_start", "12-25").split("-")
      val hi = p.getOrElse("date_end", p.getOrElse("date_start", "12-25")).split("-")
      val (loMd, hiMd) = (lo(0).toInt * 100 + lo(1).toInt, hi(0).toInt * 100 + hi(1).toInt)
      // windows crossing the year boundary (e.g. 12-25 .. 01-05) wrap
      val inWin = if (loMd <= hiMd) md >= loMd && md <= hiMd
                  else md >= loMd || md <= hiMd
      val cond0 = Generic.compare(col(p.getOrElse("var", "value")),
        p.getOrElse("op", ">="), lit(p.getOrElse("thresh", "0").toDouble))
      val cond = p.get("thresh2").map { t2 =>
        cond0 && Generic.compare(col(p.getOrElse("var2", "value2")),
          p.getOrElse("op2", ">="), lit(t2.toDouble))
      }.getOrElse(cond0)
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(coalesce(sum(when(inWin && cond, 1L)), lit(0L)).as("value")))
    }),
    // first_day_threshold_reached (generic.py:1556): doy of the first run of
    // >= window qualifying days starting at/after `after_doy`
    "first_day_reached" -> ((df, freq, p) => {
      val cond = Generic.compare(col(p.getOrElse("var", "value")),
        p.getOrElse("op", ">="), lit(p.getOrElse("thresh", "0").toDouble))
      val keyed = df.withColumn("period", graft.core.Time.resamplePeriod(col("time"), freq))
        .filter(dayofyear(col("time")) >= p.getOrElse("after_doy", "1").toInt)
      graft.core.Runs.firstRun(keyed, Seq("location_id", "period"), col("time"),
          cond, p.getOrElse("window", "1").toInt)
        .withColumn("value", dayofyear(col("first_run_start")))
        .drop("first_run_start")
    }),
    // temperature_sum (generic.py:1324): signed accumulation vs threshold
    "temperature_sum" -> ((df, freq, p) =>
      Generic.temperatureSum(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
        lit(p.getOrElse("thresh", "0").toDouble), "value")),
    // run_end_after_date (run_length.py:1148): first day after the end of
    // the first qualifying run ending on/after the given doy
    "run_end_after_date" -> ((df, freq, p) => {
      val cond = Generic.compare(col(p.getOrElse("var", "value")),
        p.getOrElse("op", ">="), lit(p.getOrElse("thresh", "0").toDouble))
      val keyed = df.withColumn("period", graft.core.Time.resamplePeriod(col("time"), freq))
      graft.core.Runs.runEndAfterDate(keyed, Seq("location_id", "period"),
          col("time"), cond, p.getOrElse("window", "1").toInt,
          p.getOrElse("after_doy", "182").toInt)
        .withColumn("value", dayofyear(col("run_end_after_date")))
        .drop("run_end_after_date")
    }),
    // HI / BEDD = biologically_effective_degree_days (_agro.py:275;
    // icclim; _agro.py huglin/BEDD simplified to their
    // month-window degree-day cores): capped clipped degree-days over a
    // month window
    "dd_capped_between" -> ((df, freq, p) => {
      val v = col(p.getOrElse("var", "value"))
      val m = month(col("time"))
      val inWin = m >= p.getOrElse("month_start", "4").toInt &&
        m <= p.getOrElse("month_end", "9").toInt
      val dd0 = greatest(v - lit(p.getOrElse("thresh", "283.15").toDouble), lit(0.0))
      val dd = p.get("cap").map(c => least(dd0, lit(c.toDouble))).getOrElse(dd0)
      Generic.resampleOp(df.withColumn("_dd", when(inWin, dd).otherwise(0.0)),
        Seq("location_id"), col("time"), freq, Seq(sum(col("_dd")).as("value")))
    }))

  /** Spinoni 2018 daily-cycle degree-day contribution (_threshold.py:844
    * cooling / :2070 heating) — shared by the `dd_approximation` base and
    * single-pass multi-output query plans. */
  def ddApproxDaily(tas: org.apache.spark.sql.Column, tx: org.apache.spark.sql.Column,
                    tn: org.apache.spark.sql.Column, thr: org.apache.spark.sql.Column,
                    kind: String): org.apache.spark.sql.Column = kind match {
    case "cooling" =>
      when(tx < thr, 0.0)
        .otherwise(when(tn < thr,
          when(tas <= thr, (tx - thr) / 4.0)
            .otherwise((tx - thr) / 2.0 - (thr - tn) / 4.0))
          .otherwise(tas - thr))
    case "heating" =>
      when(tx <= thr, thr - tas)
        .otherwise(when(tas <= thr, (thr - tn) / 2.0 - (tx - thr) / 4.0)
          .otherwise(when(tn <= thr, (thr - tn) / 4.0).otherwise(0.0)))
  }

  /** Instantiate + register an indicator from a spec and a compute-base
    * name with bound parameters (the `Indicator.from_dict` path). */
  def fromConfig(spec: IndicatorSpec, base: String,
                 bound: Map[String, String]): Indicator = {
    val fn = computeBases.getOrElse(base,
      throw new IllegalArgumentException(
        s"unknown compute base '$base'; known: ${computeBases.keys.toSeq.sorted.mkString(", ")}"))
    register(new Indicator(spec) {
      protected def compute(df: DataFrame, freq: String, params: Map[String, String]): DataFrame =
        fn(df, freq, bound ++ params)
    })
  }

  // ---- built-in indicator catalogue (SURVEY §2.2 families) ----
  // Threshold constants follow the reference's canonical defaults, expressed
  // in canonical units (K, kg m-2 s-1, m/s, m). 1 mm/d = 1/86400 kg m-2 s-1.
  def registerBuiltins(): Unit = {
    val mmd = 1.0 / 86400.0
    def temp = Seq(VarReq("value", "[temperature]", "K"))
    def prec = Seq(VarReq("value", "[precipitation]", "kg m-2 s-1"))
    def wind = Seq(VarReq("value", "[speed]", "m/s"))
    def leng = Seq(VarReq("value", "[length]", "m"))

    def reducer(id: String, title: String, base: String, v: Seq[VarReq],
                units: String, cm: String): Unit =
      fromConfig(IndicatorSpec(id, title, units, cellMethods = cm, inputs = v), base, Map.empty)

    def count(id: String, title: String, v: Seq[VarReq], op: String, thresh: Double): Unit =
      fromConfig(IndicatorSpec(id, title, "d", inputs = v),
        "threshold_count", Map("op" -> op, "thresh" -> thresh.toString))

    def dd(id: String, title: String, op: String, thresh: Double): Unit =
      fromConfig(IndicatorSpec(id, title, "K d", inputs = temp),
        "cumulative_difference", Map("op" -> op, "thresh" -> thresh.toString))

    def spell(id: String, title: String, v: Seq[VarReq], op: String, thresh: Double,
              window: Int): Unit =
      fromConfig(IndicatorSpec(id, title, "d", inputs = v, missing = "skip"),
        "spell_length_max", Map("op" -> op, "thresh" -> thresh.toString,
          "window" -> window.toString))

    // _simple.py reducers
    reducer("tg_mean", "Mean daily mean temperature", "resample_mean", temp, "K", "time: mean")
    reducer("tg_max", "Maximum daily mean temperature", "resample_max", temp, "K", "time: maximum")
    reducer("tg_min", "Minimum daily mean temperature", "resample_min", temp, "K", "time: minimum")
    reducer("tn_max", "Maximum daily minimum temperature", "resample_max", temp, "K", "time: maximum")
    reducer("tn_mean", "Mean daily minimum temperature", "resample_mean", temp, "K", "time: mean")
    reducer("tn_min", "Minimum daily minimum temperature", "resample_min", temp, "K", "time: minimum")
    reducer("tx_max", "Maximum daily maximum temperature", "resample_max", temp, "K", "time: maximum")
    reducer("tx_mean", "Mean daily maximum temperature", "resample_mean", temp, "K", "time: mean")
    reducer("tx_min", "Minimum daily maximum temperature", "resample_min", temp, "K", "time: minimum")
    reducer("max_1day_precipitation_amount", "Max 1-day precipitation", "resample_max",
      prec, "kg m-2 s-1", "time: maximum")
    reducer("precip_accumulation", "Total precipitation", "resample_sum",
      prec, "kg m-2 s-1 d", "time: sum")
    reducer("snow_depth", "Mean snow depth", "resample_mean", leng, "m", "time: mean")
    reducer("sfcWind_mean", "Mean wind speed", "resample_mean", wind, "m/s", "time: mean")
    reducer("sfcWind_max", "Maximum wind speed", "resample_max", wind, "m/s", "time: maximum")

    // threshold counts (_simple / _threshold)
    count("hot_days", "Days with tasmax > 30 degC", temp, ">", 303.15)
    count("frost_days", "Days with tasmin < 0 degC", temp, "<", 273.15)
    count("ice_days", "Days with tasmax < 0 degC", temp, "<", 273.15)
    count("tropical_nights", "Days with tasmin > 20 degC", temp, ">", 293.15)
    count("tx_days_above", "Days with tasmax above 25 degC", temp, ">", 298.15)
    count("tx_days_below", "Days with tasmax below 17 degC", temp, "<", 290.15)
    count("tn_days_above", "Days with tasmin above 20 degC", temp, ">", 293.15)
    count("tn_days_below", "Days with tasmin below -10 degC", temp, "<", 263.15)
    count("tg_days_above", "Days with tas above 10 degC", temp, ">", 283.15)
    count("tg_days_below", "Days with tas below 10 degC", temp, "<", 283.15)
    count("wetdays", "Days with precip >= 1 mm/d", prec, ">=", mmd)
    count("dry_days", "Days with precip < 0.2 mm/d", prec, "<", 0.2 * mmd)
    count("calm_days", "Days with wind < 2 m/s", wind, "<", 2.0)
    count("windy_days", "Days with wind > 10.8 m/s", wind, ">", 10.8)
    count("snd_days_above", "Days with snow depth > 2 cm", leng, ">", 0.02)

    // degree days
    dd("growing_degree_days", "Growing degree days (> 4 degC)", ">", 277.15)
    dd("cooling_degree_days", "Cooling degree days (> 18 degC)", ">", 291.15)
    dd("heating_degree_days", "Heating degree days (< 17 degC)", "<", 290.15)
    dd("freezing_degree_days", "Freezing degree days (< 0 degC)", "<", 273.15)

    // spells
    spell("heat_wave_index", "Max heat spell length (tasmax > 25 degC, 5d)", temp, ">", 298.15, 5)
    spell("cold_spell_max_length", "Max cold spell (tas < -10 degC, 3d)", temp, "<", 263.15, 3)
    spell("maximum_consecutive_dry_days", "Max consecutive dry days", prec, "<", mmd, 1)
    spell("maximum_consecutive_wet_days", "Max consecutive wet days", prec, ">=", mmd, 1)
    spell("maximum_consecutive_frost_days", "Max consecutive frost days", temp, "<", 273.15, 1)

    // percentile-based (tx90p family, _multivariate.py:1300-1654; WSDI/CSDI
    // :69,:1719) — doy climatology pool +-2d (reference default 5-day window)
    def pctl(id: String, title: String, per: Double, op: String): Unit =
      fromConfig(IndicatorSpec(id, title, "d", inputs = temp, missing = "skip"),
        "doy_percentile_count", Map("per" -> per.toString, "op" -> op))
    pctl("tx90p", "Days with tasmax above the 90th doy percentile", 0.9, ">")
    pctl("tx10p", "Days with tasmax below the 10th doy percentile", 0.1, "<")
    pctl("tn90p", "Days with tasmin above the 90th doy percentile", 0.9, ">")
    pctl("tn10p", "Days with tasmin below the 10th doy percentile", 0.1, "<")
    pctl("tg90p", "Days with tas above the 90th doy percentile", 0.9, ">")
    pctl("tg10p", "Days with tas below the 10th doy percentile", 0.1, "<")
    fromConfig(IndicatorSpec("warm_spell_duration_index",
      "Days in spells of >= 6 days with tasmax above the 90th doy percentile",
      "d", inputs = temp, missing = "skip"),
      "doy_percentile_spell", Map("per" -> "0.9", "op" -> ">", "window" -> "6"))
    fromConfig(IndicatorSpec("cold_spell_duration_index",
      "Days in spells of >= 6 days with tasmin below the 10th doy percentile",
      "d", inputs = temp, missing = "skip"),
      "doy_percentile_spell", Map("per" -> "0.1", "op" -> "<", "window" -> "6"))

    // occurrences
    fromConfig(IndicatorSpec("first_day_temperature_above",
      "First day with tas above 5 degC", "1", inputs = temp, missing = "skip"),
      "first_occurrence", Map("op" -> ">", "thresh" -> "278.15"))
    fromConfig(IndicatorSpec("first_day_temperature_below",
      "First day with tas below 0 degC", "1", inputs = temp, missing = "skip"),
      "first_occurrence", Map("op" -> "<", "thresh" -> "273.15"))

    registerExtended()
  }

  /** The breadth catalogue: named indicators of `_simple.py`,
    * `_threshold.py`, `_multivariate.py`, `_hydrology.py` and `_anuclim.py`
    * that are pure configurations over the generic bases (each entry is the
    * reference's documented default thresholds in canonical units). */
  def registerExtended(): Unit = {
    val mmd = 1.0 / 86400.0
    def temp = Seq(VarReq("value", "[temperature]", "K"))
    def prec = Seq(VarReq("value", "[precipitation]", "kg m-2 s-1"))
    def wind = Seq(VarReq("value", "[speed]", "m/s"))
    def leng = Seq(VarReq("value", "[length]", "m"))
    def swe  = Seq(VarReq("value", "[mass]/[area]", "kg m-2"))

    def cfg(id: String, title: String, units: String, v: Seq[VarReq], base: String,
            p: (String, String)*): Unit =
      fromConfig(IndicatorSpec(id, title, units, inputs = v, missing = "skip"),
        base, p.toMap)

    // --- remaining simple reducers (_simple.py) ---
    cfg("sfcWind_min", "Minimum wind speed", "m/s", wind, "resample_min")
    cfg("sfcWindmax_max", "Maximum daily max wind", "m/s", wind, "resample_max")
    cfg("sfcWindmax_mean", "Mean daily max wind", "m/s", wind, "resample_mean")
    cfg("sfcWindmax_min", "Minimum daily max wind", "m/s", wind, "resample_min")
    cfg("max_pr_intensity", "Max hourly precipitation intensity", "kg m-2 s-1",
      prec, "resample_max")
    cfg("snw_max", "Maximum snow water equivalent", "kg m-2", swe, "resample_max")
    cfg("snd_max", "Maximum snow depth", "m", leng, "resample_max")
    cfg("max_n_day_precipitation_amount", "Max 3-day precipitation total",
      "kg m-2 s-1 d", prec, "rolling_resample",
      "window" -> "3", "win_reducer" -> "sum", "reducer" -> "max")

    // --- remaining threshold counts / fractions (_threshold.py) ---
    cfg("wetdays_prop", "Fraction of days with precip >= 1 mm/d", "1", prec,
      "threshold_prop", "op" -> ">=", "thresh" -> mmd.toString)
    cfg("rprctot", "Share of total precip from days >= 1 mm/d", "1", prec,
      "threshold_sum_fraction", "op" -> ">=", "thresh" -> mmd.toString)
    cfg("warm_day_frequency", "Days with tasmax > 30 degC", "d", temp,
      "threshold_count", "op" -> ">", "thresh" -> "303.15")
    cfg("warm_night_frequency", "Days with tasmin > 22 degC", "d", temp,
      "threshold_count", "op" -> ">", "thresh" -> "295.15")
    cfg("snw_days_above", "Days with SWE > 4 kg m-2", "d", swe,
      "threshold_count", "op" -> ">", "thresh" -> "4.0")
    cfg("sdii", "Simple daily intensity index (mean precip on wet days)",
      "kg m-2 s-1", prec, "thresholded_stat",
      "op" -> ">=", "thresh" -> mmd.toString, "reducer" -> "mean")

    // --- spell family (_threshold.py:760-1090; generic `spell_length` /
    //     spell-stat reducers) ---
    def spellStat(id: String, title: String, v: Seq[VarReq], op: String,
                  thresh: Double, window: Int, red: String): Unit =
      cfg(id, title, if (red == "count") "1" else "d", v, "spell_stat",
        "op" -> op, "thresh" -> thresh.toString,
        "window" -> window.toString, "reducer" -> red)
    spellStat("cold_spell_days", "Days in cold spells (tas < -10 degC, 5d)",
      temp, "<", 263.15, 5, "sum")
    spellStat("cold_spell_frequency", "Number of cold spells", temp, "<", 263.15, 5, "count")
    spellStat("hot_spell_max_length", "Longest hot spell (tasmax > 30 degC, 3d)",
      temp, ">", 303.15, 3, "max")
    spellStat("hot_spell_frequency", "Number of hot spells", temp, ">", 303.15, 3, "count")
    spellStat("hot_spell_total_length", "Days in hot spells", temp, ">", 303.15, 3, "sum")
    spellStat("dry_spell_frequency", "Number of dry spells (< 1 mm/d, 3d)",
      prec, "<", mmd, 3, "count")
    spellStat("dry_spell_total_length", "Days in dry spells", prec, "<", mmd, 3, "sum")
    spellStat("wet_spell_frequency", "Number of wet spells (>= 1 mm/d, 3d)",
      prec, ">=", mmd, 3, "count")
    spellStat("wet_spell_total_length", "Days in wet spells", prec, ">=", mmd, 3, "sum")
    spellStat("wet_spell_max_length", "Longest wet spell", prec, ">=", mmd, 3, "max")
    spellStat("consecutive_frost_free_days", "Longest run with tasmin >= 0 degC",
      temp, ">=", 273.15, 1, "max")
    spellStat("frost_free_spell_max_length", "Longest frost-free spell",
      temp, ">=", 273.15, 3, "max")

    // --- heat waves (bivariate tn/tx, _multivariate.py:170-470) ---
    def hw(id: String, title: String, red: String): Unit =
      cfg(id, title, if (red == "count") "1" else "d",
        Seq(VarReq("value", "[temperature]", "K"), VarReq("value2", "[temperature]", "K")),
        "bivariate_spell_stat", "op" -> ">", "thresh" -> "295.15",
        "op2" -> ">", "thresh2" -> "303.15", "window" -> "3", "reducer" -> red)
    hw("heat_wave_max_length", "Longest heat wave (tn > 22 & tx > 30 degC, 3d)", "max")
    hw("heat_wave_frequency", "Number of heat waves", "count")
    hw("heat_wave_total_length", "Days in heat waves", "sum")

    // --- snow / precip events (_threshold.py:366-700, 1817-3003) ---
    cfg("snd_storm_days", "Days with snow-depth growth >= 10 cm", "d", leng,
      "lag_diff_count", "op" -> ">=", "thresh" -> "0.1")
    cfg("snw_storm_days", "Days with SWE growth >= 10 kg m-2", "d", swe,
      "lag_diff_count", "op" -> ">=", "thresh" -> "10.0")
    cfg("winter_storm", "Days with snow-depth growth >= 25 cm", "d", leng,
      "lag_diff_count", "op" -> ">=", "thresh" -> "0.25")
    cfg("days_with_snow", "Days with snowfall in (low, high]", "d", prec,
      "domain_count", "low" -> (0.5 * mmd).toString, "high" -> (100.0 * mmd).toString)
    cfg("snowfall_frequency", "Fraction of days with snowfall >= 1 mm/d", "1", prec,
      "threshold_prop", "op" -> ">=", "thresh" -> mmd.toString)
    cfg("snowfall_intensity", "Mean snowfall on snowfall days", "kg m-2 s-1", prec,
      "thresholded_stat", "op" -> ">=", "thresh" -> mmd.toString, "reducer" -> "mean")
    cfg("snow_melt_we_max", "Max day-over-day SWE loss", "kg m-2", swe, "lag_drop_max")

    // --- bivariate day counts (_multivariate.py:252-426, 944, 1604) ---
    def biv(id: String, title: String, op1: String, t1: Double, op2: String,
            t2: Double): Unit =
      cfg(id, title, "d",
        Seq(VarReq("value", "[temperature]", "K"), VarReq("value2", "[precipitation]", "kg m-2 s-1")),
        "bivariate_count", "op" -> op1, "thresh" -> t1.toString,
        "op2" -> op2, "thresh2" -> t2.toString)
    biv("cold_and_dry_days", "Days tas < 0 degC and pr < 1 mm/d", "<", 273.15, "<", mmd)
    biv("cold_and_wet_days", "Days tas < 0 degC and pr >= 1 mm/d", "<", 273.15, ">=", mmd)
    biv("warm_and_dry_days", "Days tas > 20 degC and pr < 1 mm/d", ">", 293.15, "<", mmd)
    biv("warm_and_wet_days", "Days tas > 20 degC and pr >= 1 mm/d", ">", 293.15, ">=", mmd)
    biv("rain_on_frozen_ground_days", "Days pr > 1 mm/d on frozen ground",
      "<", 273.15, ">", mmd)
    biv("high_precip_low_temp", "Days pr >= 10 mm/d and tas < -0.2 degC",
      "<", 272.95, ">=", 10 * mmd)
    cfg("blowing_snow", "Days with snd >= 5 cm and wind >= 15 km/h", "d",
      Seq(VarReq("value", "[length]", "m"), VarReq("value2", "[speed]", "m/s")),
      "bivariate_count", "op" -> ">=", "thresh" -> "0.05",
      "op2" -> ">=", "thresh2" -> (15.0 / 3.6).toString)
    cfg("tx_tn_days_above", "Days tn > 22 and tx > 30 degC", "d",
      Seq(VarReq("value", "[temperature]", "K"), VarReq("value2", "[temperature]", "K")),
      "bivariate_count", "op" -> ">", "thresh" -> "295.15",
      "op2" -> ">", "thresh2" -> "303.15")

    // --- season bounds (_threshold.py:1096-1500, snow season :366-561) ---
    def season(id: String, title: String, v: Seq[VarReq], op: String, thresh: Double,
               window: Int, midM: Int, bound: String): Unit =
      cfg(id, title, if (bound == "length") "d" else "1", v, "season_bound",
        "op" -> op, "thresh" -> thresh.toString, "window" -> window.toString,
        "mid_month" -> midM.toString, "bound" -> bound)
    season("growing_season_start", "Start of growing season (tas >= 5 degC, 6d)",
      temp, ">=", 278.15, 6, 7, "start")
    season("growing_season_end", "End of growing season", temp, ">=", 278.15, 6, 7, "end")
    season("growing_season_length", "Length of growing season", temp, ">=", 278.15, 6, 7, "length")
    season("frost_free_season_start", "Start of frost-free season (tasmin >= 0, 5d)",
      temp, ">=", 273.15, 5, 7, "start")
    season("frost_free_season_end", "End of frost-free season", temp, ">=", 273.15, 5, 7, "end")
    season("frost_free_season_length", "Length of frost-free season", temp, ">=", 273.15, 5, 7, "length")
    season("frost_season_length", "Length of frost season (tasmin < 0, 5d)",
      temp, "<", 273.15, 5, 1, "length")
    season("snd_season_start", "Start of snow-depth season (snd >= 2 cm, 3d)",
      leng, ">=", 0.02, 3, 7, "start")
    season("snd_season_end", "End of snow-depth season", leng, ">=", 0.02, 3, 7, "end")
    season("snd_season_length", "Length of snow-depth season", leng, ">=", 0.02, 3, 7, "length")
    season("snw_season_start", "Start of SWE season (snw >= 4 kg m-2, 3d)",
      swe, ">=", 4.0, 3, 7, "start")
    season("snw_season_end", "End of SWE season", swe, ">=", 4.0, 3, 7, "end")
    season("snw_season_length", "Length of SWE season", swe, ">=", 4.0, 3, 7, "length")

    // --- occurrences / doy-of-extreme (_threshold.py, _hydrology.py) ---
    cfg("last_spring_frost", "Last day with tasmin < 0 degC", "1", temp,
      "last_occurrence", "op" -> "<", "thresh" -> "273.15")
    cfg("first_snowfall", "First day with snowfall >= 1 mm/d", "1", prec,
      "first_occurrence", "op" -> ">=", "thresh" -> mmd.toString)
    cfg("last_snowfall", "Last day with snowfall >= 1 mm/d", "1", prec,
      "last_occurrence", "op" -> ">=", "thresh" -> mmd.toString)
    cfg("snd_max_doy", "Day of year of max snow depth", "1", leng, "doy_of_max")
    cfg("snw_max_doy", "Day of year of max SWE", "1", swe, "doy_of_max")
    cfg("doy_qmax", "Day of year of max streamflow", "1",
      Seq(VarReq("value", "[discharge]", "m3 s-1")), "doy_of_max")
    cfg("doy_qmin", "Day of year of min streamflow", "1",
      Seq(VarReq("value", "[discharge]", "m3 s-1")), "doy_of_min")

    // --- anuclim leftovers (_anuclim.py:51, 360) ---
    fromConfig(IndicatorSpec("isothermality", "Isothermality (BIO3)", "%",
      inputs = Seq(VarReq("valuemin", "[temperature]", "K"),
        VarReq("valuemax", "[temperature]", "K")), missing = "skip"),
      "isothermality", Map.empty)
    cfg("prcptot", "Total precipitation (ANUCLIM P12)", "kg m-2 s-1 d", prec,
      "resample_sum")
    cfg("prcptot_wet_period", "Precip total of wet days", "kg m-2 s-1 d", prec,
      "thresholded_stat", "op" -> ">=", "thresh" -> mmd.toString, "reducer" -> "sum")
    // P13/P14 (_anuclim.py:474): precip of the wettest/driest sub-period;
    // inputs are pre-aggregated period amounts (weekly/monthly)
    cfg("prcptot_wettest_period", "Precip of the wettest period (ANUCLIM P13)",
      "kg m-2 s-1 d", prec, "resample_max")
    cfg("prcptot_driest_period", "Precip of the driest period (ANUCLIM P14)",
      "kg m-2 s-1 d", prec, "resample_min")

    // --- round-3 catalogue tail ---
    // remaining spell-family members (_threshold.py:317,:3457,:3003,:2019)
    cfg("cold_spell_total_length", "Days in cold spells (tas < -10 degC, 3d)",
      "d", temp, "spell_stat", "op" -> "<", "thresh" -> "263.15",
      "window" -> "3", "reducer" -> "sum")
    cfg("dry_spell_max_length", "Longest dry spell (< 1 mm/d, 3d)", "d", prec,
      "spell_stat", "op" -> "<", "thresh" -> mmd.toString,
      "window" -> "3", "reducer" -> "max")
    cfg("maximum_consecutive_tx_days", "Longest run with tasmax > 25 degC",
      "d", temp, "spell_stat", "op" -> ">", "thresh" -> "298.15",
      "window" -> "1", "reducer" -> "max")
    cfg("hot_spell_max_magnitude",
      "Magnitude of the most intense hot spell (sum of tasmax excess, 3d)",
      "K d", temp, "spell_max_magnitude", "thresh" -> "298.15", "window" -> "3")
    // multiday_temperature_swing (_multivariate.py:426): freeze-thaw spells
    // (tasmax > 0 degC and tasmin <= 0 degC), mean event length
    cfg("multiday_temperature_swing", "Mean freeze-thaw spell length", "d",
      Seq(VarReq("value", "[temperature]", "K"), VarReq("value2", "[temperature]", "K")),
      "bivariate_spell_stat", "op" -> ">", "thresh" -> "273.15",
      "op2" -> "<=", "thresh2" -> "273.15", "window" -> "1", "reducer" -> "mean")
    // Spinoni 2018 daily-cycle degree-day approximations
    def cyc = Seq(VarReq("value", "[temperature]", "K"),
      VarReq("valuemax", "[temperature]", "K"), VarReq("valuemin", "[temperature]", "K"))
    fromConfig(IndicatorSpec("cooling_degree_days_approximation",
      "Cooling degree days (daily-cycle approximation)", "K d",
      inputs = cyc, missing = "skip"),
      "dd_approximation", Map("kind" -> "cooling", "thresh" -> "291.15"))
    fromConfig(IndicatorSpec("heating_degree_days_approximation",
      "Heating degree days (daily-cycle approximation)", "K d",
      inputs = cyc, missing = "skip"),
      "dd_approximation", Map("kind" -> "heating", "thresh" -> "290.15"))
    // holiday snow (Christmas Days, _threshold.py:3743,:3799)
    cfg("holiday_snow_days", "Christmas days with snow cover >= 20 mm", "d",
      leng, "holiday_count", "op" -> ">=", "thresh" -> "0.02",
      "date_start" -> "12-25")
    fromConfig(IndicatorSpec("holiday_snow_and_snowfall_days",
      "Christmas days with snow cover and measurable snowfall", "d",
      inputs = Seq(VarReq("value", "[length]", "m"),
        VarReq("value2", "[precipitation]", "kg m-2 s-1")), missing = "skip"),
      "holiday_count", Map("op" -> ">=", "thresh" -> "0.02",
        "op2" -> ">=", "thresh2" -> mmd.toString, "date_start" -> "12-25"))
    // first_day_threshold_reached (generic.py:1556) with window + after-date
    cfg("first_day_threshold_reached", "First day tas >= 5 degC for 3 days",
      "1", temp, "first_day_reached", "op" -> ">=", "thresh" -> "278.15",
      "window" -> "3", "after_doy" -> "1")

    // --- canonical reference names over existing bases (the lookup names a
    // reference user would reach for; same compute, documented defaults) ---
    cfg("maximum_consecutive_frost_free_days", "Longest run with tasmin >= 0 degC",
      "d", temp, "spell_stat", "op" -> ">=", "thresh" -> "273.15",
      "window" -> "1", "reducer" -> "max")
    cfg("daily_pr_intensity", "SDII: mean precip on wet days (_threshold.py:680)",
      "kg m-2 s-1", prec, "thresholded_stat",
      "op" -> ">=", "thresh" -> mmd.toString, "reducer" -> "mean")
    cfg("days_over_precip_thresh", "Days over the wet-day 75th percentile (_multivariate.py:1176)",
      "d", prec, "wetday_percentile_count", "per" -> "0.75",
      "wet_thresh" -> mmd.toString)
    cfg("fraction_over_precip_thresh",
      "Fraction of wet-day precip above the wet-day 75th percentile (_multivariate.py:1238)",
      "1", prec, "wetday_percentile_fraction", "per" -> "0.75",
      "wet_thresh" -> mmd.toString)
    def dtrVars = Seq(VarReq("value", "[temperature]", "K"),
      VarReq("value2", "[temperature]", "K"))
    cfg("daily_temperature_range", "Mean diurnal_temperature_range (_multivariate.py:514)",
      "K", dtrVars, "daily_range_mean")
    cfg("daily_temperature_range_variability",
      "Mean absolute day-to-day DTR change (_multivariate.py:561)", "K",
      dtrVars, "daily_range_variability")
    cfg("extreme_temperature_range", "Period max tasmax - min tasmin (generic.py:1388)",
      "K", dtrVars, "etr")
    cfg("temperature_seasonality", "CV of monthly mean temperature (ANUCLIM P4)",
      "%", temp, "temp_seasonality_cv")
    cfg("precip_seasonality", "CV of monthly precip totals (ANUCLIM P15)",
      "%", prec, "precip_seasonality_cv")
    def quarterVars = Seq(VarReq("value", "[temperature]", "K"),
      VarReq("value2", "[precipitation]", "kg m-2 s-1"))
    cfg("tg_mean_wetdry_quarter", "Mean temp of the wettest quarter (_anuclim.py:275)",
      "K", quarterVars, "quarter_select",
      "sel_var" -> "value2", "sel_agg" -> "sum", "sel_op" -> "max",
      "out_var" -> "value", "out_agg" -> "mean")
    cfg("tg_mean_warmcold_quarter", "Mean temp of the warmest quarter (_anuclim.py:215)",
      "K", quarterVars, "quarter_select",
      "sel_var" -> "value", "sel_agg" -> "mean", "sel_op" -> "max",
      "out_var" -> "value", "out_agg" -> "mean")
    cfg("prcptot_wetdry_quarter", "Precip total of the wettest quarter (_anuclim.py:331)",
      "kg m-2 s-1 d", quarterVars, "quarter_select",
      "sel_var" -> "value2", "sel_agg" -> "sum", "sel_op" -> "max",
      "out_var" -> "value2", "out_agg" -> "sum")
    cfg("prcptot_warmcold_quarter", "Precip total of the warmest quarter (_anuclim.py:389)",
      "kg m-2 s-1 d", quarterVars, "quarter_select",
      "sel_var" -> "value", "sel_agg" -> "mean", "sel_op" -> "max",
      "out_var" -> "value2", "out_agg" -> "sum")
  }
}
