package graft.indicator

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The QC data-flags battery (`xclim/core/dataflags.py:127-554`) and
  * `ecad_compliant` (:749): per-row boolean flags over a multivariate daily
  * frame, reduced to per-entity counts + an all-clear verdict.
  *
  * Row-local flags are pure projections; the two run-based flags reuse the
  * gaps-and-islands window (one shuffle on the entity key); the climatology
  * flag joins a broadcast (entity, doy) table built with the percentile_doy
  * pooling pattern. Everything shares the one entity partitioning at scale.
  */
object DataFlags {

  // --- row-local flags (dataflags.py:127-346, 422, 554) ---
  def tasmaxBelowTasmin(tasmax: Column, tasmin: Column): Column = tasmax < tasmin
  def tasExceedsTasmax(tas: Column, tasmax: Column): Column = tas > tasmax
  def tasBelowTasmin(tas: Column, tasmin: Column): Column = tas < tasmin
  def temperatureExtremelyLow(tasC: Column, threshC: Double = -90.0): Column = tasC < threshC
  def temperatureExtremelyHigh(tasC: Column, threshC: Double = 60.0): Column = tasC > threshC
  def negativeAccumulation(acc: Column): Column = acc < 0.0
  def veryLargePrecipitation(prMmd: Column, threshMmd: Double = 300.0): Column =
    prMmd > threshMmd
  def windOutsideBounds(windMs: Column, lo: Double = 0.0, hi: Double = 46.0): Column =
    windMs < lo || windMs > hi
  def percentageOutsideBounds(pct: Column): Column = pct < 0.0 || pct > 100.0

  /** specific_discharge_extremely_high (dataflags.py:823). */
  def specificDischargeExtremelyHigh(qMmd: Column, threshMmd: Double = 100.0): Column =
    qMmd > threshMmd

  /** values_repeating_for_n_or_more_days (dataflags.py:521): flag every row
    * inside a run of >= n identical values. */
  def repeatingValues(keys: Seq[String], time: Column, v: Column, n: Int): Column = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(time)
    val newRun = when(v <=> lag(v, 1).over(w), 0).otherwise(1)
    val runId = sum(newRun).over(w.rowsBetween(Window.unboundedPreceding, 0))
    val wRun = Window.partitionBy((keys.map(col) :+ runId): _*)
    count(lit(1)).over(wRun) >= n
  }

  /** values_op_thresh_repeating_for_n_or_more_days (dataflags.py:377):
    * like [[repeatingValues]] but only runs of rows equal to `thresh`. */
  def threshRepeating(keys: Seq[String], time: Column, v: Column, thresh: Double,
                      n: Int): Column =
    repeatingValues(keys, time, v, n) && v === thresh

  /** outside_n_standard_deviations_of_climatology (dataflags.py:466): value
    * beyond mean +- n sigma of its (entity, doy +- window) climatology.
    * Returns the input plus a `_clim_flag` column; one fan-out hash-agg for
    * the climatology + a broadcast join back (the percentile_doy pattern —
    * bounded state at any scale). */
  def outsideClimatology(df: DataFrame, keys: Seq[String], time: Column, v: Column,
                         nSigma: Double = 5.0, window: Int = 5): DataFrame = {
    val half = window / 2
    val contrib = df
      .select((keys.map(col) :+ dayofyear(time).as("_doy") :+ v.as("_v")): _*)
      .withColumn("_tdoy", explode(sequence(col("_doy") - half, col("_doy") + half)))
      .withColumn("_tdoy",
        when(col("_tdoy") < 1, col("_tdoy") + 365)
          .when(col("_tdoy") > 365, col("_tdoy") - 365).otherwise(col("_tdoy")))
    val clim = contrib.groupBy((keys.map(col) :+ col("_tdoy")): _*)
      .agg(avg(col("_v")).as("_cm"), stddev_pop(col("_v")).as("_cs"))
      .select((keys.map(k => col(k).as(s"_ck_$k")) :+ col("_tdoy") :+
        col("_cm") :+ col("_cs")): _*)
    df.withColumn("_doy", when(dayofyear(time) > 365, 365).otherwise(dayofyear(time)))
      .join(broadcast(clim), keys.map(k => col(k) === col(s"_ck_$k"))
        .reduce(_ && _) && col("_doy") === col("_tdoy"), "left")
      // both comparison operands quantized to the 1e-6 integer grid
      // (floor(x·1e6+0.5) — the house q6 discipline): the verdict must
      // not depend on which engine's float-summation order computed the
      // moments, and the integer compare is bit-identical everywhere
      .withColumn("_clim_flag",
        floor(abs(v - col("_cm")) * lit(1e6) + lit(0.5)).cast("long") >
          floor(lit(nSigma) * col("_cs") * lit(1e6) + lit(0.5)).cast("long"))
      .drop((keys.map(k => s"_ck_$k") ++ Seq("_tdoy", "_doy", "_cm", "_cs")): _*)
  }

  /** Run the full battery over a daily frame and reduce per entity: one
    * count per flag + `ecad_qc_flag` (true only when every flag count is 0,
    * ecad_compliant dataflags.py:749). `flags` maps flag name -> row
    * condition. */
  /** `ecad_compliant` auto-battery (dataflags.py:749 driven by the
    * per-variable flag sets of `data/variables.yml`): apply every flag
    * whose variables are present as columns. Daily rows keyed by `keys`
    * with a `time` column; variables by CF name (tas, tasmax, tasmin, pr,
    * sfcWind, hurs, q); temperatures degC, pr mm/d, wind m/s. Powers the
    * CLI `dataflags` command (cli.py:231). */
  def ecadCompliant(df0: DataFrame, keys: Seq[String] = Seq("location_id"),
                    time: Column = col("time")): DataFrame = {
    val have = df0.columns.toSet
    var df = df0
    val flags = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    if (have("tasmax") && have("tasmin"))
      flags += "tasmax_below_tasmin" -> tasmaxBelowTasmin(col("tasmax"), col("tasmin"))
    if (have("tas") && have("tasmax"))
      flags += "tas_exceeds_tasmax" -> tasExceedsTasmax(col("tas"), col("tasmax"))
    if (have("tas") && have("tasmin"))
      flags += "tas_below_tasmin" -> tasBelowTasmin(col("tas"), col("tasmin"))
    for (t <- Seq("tas", "tasmax", "tasmin") if have(t)) {
      flags += s"${t}_extremely_low" -> temperatureExtremelyLow(col(t))
      flags += s"${t}_extremely_high" -> temperatureExtremelyHigh(col(t))
      flags += s"${t}_repeating_5_days" -> repeatingValues(keys, time, col(t), 5)
    }
    if (have("tas")) {
      df = outsideClimatology(df, keys, time, col("tas"), nSigma = 5.0, window = 5)
      flags += "tas_outside_5sigma_climatology" -> col("_clim_flag")
    }
    if (have("pr")) {
      flags += "negative_accumulation_values" -> negativeAccumulation(col("pr"))
      flags += "very_large_precipitation_events" -> veryLargePrecipitation(col("pr"))
      flags += "pr_5mm_repeating_5_days" -> threshRepeating(keys, time, col("pr"), 5.0, 5)
    }
    if (have("sfcWind"))
      flags += "wind_values_outside_of_bounds" -> windOutsideBounds(col("sfcWind"))
    if (have("hurs"))
      flags += "percentage_values_outside_of_bounds" -> percentageOutsideBounds(col("hurs"))
    if (have("q"))
      flags += "specific_discharge_extremely_high" -> specificDischargeExtremelyHigh(col("q"))
    require(flags.nonEmpty,
      s"no known CF variable columns among ${df0.columns.mkString(", ")}")
    battery(df, keys, flags.toMap)
  }

  def battery(df: DataFrame, keys: Seq[String], flags: Map[String, Column]): DataFrame = {
    val names = flags.keys.toSeq.sorted
    // project first: flag conditions may be window expressions, which can't
    // sit inside the aggregate
    val projected = df.select((keys.map(col) ++ names.map(n => flags(n).as(s"_f_$n"))): _*)
    val aggs = names.map(n =>
      coalesce(sum(when(col(s"_f_$n"), 1L)), lit(0L)).as(s"n_$n"))
    val counts = projected.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    counts.withColumn("ecad_qc_flag",
      flags.keys.toSeq.sorted.map(n => col(s"n_$n") === 0L).reduce(_ && _))
  }
}
