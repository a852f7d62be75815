package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length ("spells") toolkit — the engine's re-expression of
  * `xclim/indices/run_length.py` as pure window-function plans
  * (gaps-and-islands), with no UDFs and no driver-side iteration.
  *
  * Core identity (run_length.py:144 `_cumsum_reset`, :223 `rle`): order rows
  * by time within an entity; a new run starts whenever the boolean condition
  * turns true after a false (or at the first row). We compute
  * `run_id = sum(1 - cond) over (partition by keys order by time)`; all rows
  * of one contiguous true-run share a run_id, and per-run statistics become a
  * groupBy over (keys, run_id).
  *
  * Scale notes:
  *  - The window sort shuffles once on the entity keys; every derived
  *    statistic reuses that partitioning (Catalyst reuses the exchange), so a
  *    full spell analysis is ONE shuffle at 100 TB.
  *  - Periods (resample-then-runlength, run_length.py:87 `resample_and_rl`)
  *    are handled by adding the period column to the partition keys, which
  *    breaks runs at period boundaries exactly like the reference default.
  *  - Runs are over *rows present*; for calendar-gap-aware runs densify
  *    first (see `graft.indices` builders) so a missing day breaks the run.
  */
object Runs {

  /** Adds `condName` (int 0/1) and `runName` (long run id) columns.
    * Rows where cond is true share `runName` per contiguous run.
    * Null cond counts as false (breaks the run), matching NaN-breaks-run
    * semantics in the reference.
    */
  def withRunId(df: DataFrame, keys: Seq[String], order: Column, cond: Column,
                condName: String = "_cond", runName: String = "_run_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(condName, when(cond, 1).otherwise(0))
      .withColumn(runName, sum(lit(1) - col(condName)).over(w))
  }

  /** One row per run: keys, run_id, run_start, run_end, run_len (+ optional
    * extra aggregates evaluated over the run's rows).
    * Re-expression of `run_bounds` (run_length.py:745) / `rle` (:223).
    */
  def runTable(df: DataFrame, keys: Seq[String], order: Column, cond: Column,
               extraAggs: Seq[Column] = Nil): DataFrame = {
    val flagged = withRunId(df, keys, order, cond)
    val aggs: Seq[Column] = Seq(
      min(order).as("run_start"),
      max(order).as("run_end"),
      count(lit(1)).as("run_len")) ++ extraAggs
    flagged.filter(col("_cond") === 1)
      .groupBy((keys.map(col) :+ col("_run_id")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Run-length statistics per (keys, period): reduce lengths of runs with
    * run_len >= window (run_length.py:275 `rle_statistics`). Runs break at
    * period boundaries when `period` is provided (resample-before-rl).
    * reducer: max | min | mean | sum | count.
    * Entities/periods with no qualifying run get 0 (coalesce like the
    * reference's fillna(0)).
    */
  def rleStatistics(df: DataFrame, keys: Seq[String], period: Option[Column], order: Column,
                    cond: Column, reducer: String, window: Int = 1): DataFrame = {
    val keyed = period match {
      case Some(p) => df.withColumn("_period", p)
      case None    => df
    }
    val allKeys = keys ++ period.map(_ => "_period").toSeq
    val runs = runTable(keyed, allKeys, order, cond)
      .filter(col("run_len") >= window)
    val red: Column = reducer match {
      case "max"   => max(col("run_len"))
      case "min"   => min(col("run_len"))
      case "mean"  => avg(col("run_len"))
      case "sum"   => sum(col("run_len"))
      case "count" => count(lit(1))
      case other   => throw new IllegalArgumentException(s"bad reducer: $other")
    }
    runs.groupBy(allKeys.map(col): _*).agg(red.as(s"run_${reducer}"))
  }

  /** Longest run per (keys[, period]) — run_length.py:338. */
  def longestRun(df: DataFrame, keys: Seq[String], period: Option[Column], order: Column,
                 cond: Column): DataFrame =
    rleStatistics(df, keys, period, order, cond, "max")

  /** Number of runs of at least `window` — run_length.py:381
    * `windowed_run_events`. */
  def windowedRunEvents(df: DataFrame, keys: Seq[String], period: Option[Column], order: Column,
                        cond: Column, window: Int): DataFrame =
    rleStatistics(df, keys, period, order, cond, "count", window)

  /** Total rows inside runs of at least `window` — run_length.py:437
    * `windowed_run_count`. */
  def windowedRunCount(df: DataFrame, keys: Seq[String], period: Option[Column], order: Column,
                       cond: Column, window: Int): DataFrame =
    rleStatistics(df, keys, period, order, cond, "sum", window)

  /** Max over runs of the within-run sum of `value` — run_length.py:491
    * `windowed_max_run_sum`. */
  def windowedMaxRunSum(df: DataFrame, keys: Seq[String], order: Column, cond: Column,
                        value: Column, window: Int): DataFrame =
    runTable(df, keys, order, cond, Seq(sum(value).as("run_sum")))
      .filter(col("run_len") >= window)
      .groupBy(keys.map(col): _*)
      .agg(max(col("run_sum")).as("max_run_sum"))

  /** Start of first run of >= `window` true rows — run_length.py:643
    * `first_run` (last_run is the mirror with max). */
  def firstRun(df: DataFrame, keys: Seq[String], order: Column, cond: Column,
               window: Int): DataFrame =
    runTable(df, keys, order, cond)
      .filter(col("run_len") >= window)
      .groupBy(keys.map(col): _*)
      .agg(min(col("run_start")).as("first_run_start"))

  def lastRun(df: DataFrame, keys: Seq[String], order: Column, cond: Column,
              window: Int): DataFrame =
    runTable(df, keys, order, cond)
      .filter(col("run_len") >= window)
      .groupBy(keys.map(col): _*)
      .agg(max(col("run_start")).as("last_run_start"))

  /** Mask keeping only each entity's longest run (ties -> earliest), joined
    * back onto the input — run_length.py:805 `keep_longest_run`. */
  def keepLongestRun(df: DataFrame, keys: Seq[String], order: Column, cond: Column): DataFrame = {
    val flagged = withRunId(df, keys, order, cond)
    val wRun = Window.partitionBy((keys :+ "_run_id").map(col): _*)
    val wKey = Window.partitionBy(keys.map(col): _*)
    val withLen = flagged.withColumn("_run_len",
      when(col("_cond") === 1, count(lit(1)).over(wRun)).otherwise(0L))
    // rank runs by (len desc, start asc): longest run's length per key
    val best = withLen.withColumn("_best", max(col("_run_len")).over(wKey))
      .withColumn("_best_run", min(when(col("_run_len") === col("_best"), col("_run_id"))).over(wKey))
    best.withColumn("in_longest_run", col("_cond") === 1 && col("_run_id") === col("_best_run"))
      .drop("_cond", "_run_id", "_run_len", "_best", "_best_run")
  }

  /** Event state machine (run_length.py:844 `runs_with_holes`): state turns
    * on after `windowStart` consecutive true `startCond` rows, and off after
    * `windowStop` consecutive true `stopCond` rows. Returns the input plus an
    * `in_event` boolean column. Pure window plan: qualify markers with a
    * bounded min-over-window, then forward-fill the latest marker.
    */
  def runsWithHoles(df: DataFrame, keys: Seq[String], order: Column,
                    startCond: Column, windowStart: Int,
                    stopCond: Column, windowStop: Int): DataFrame = {
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(order)
    val wStart = wOrd.rowsBetween(-(windowStart - 1), 0)
    val wStop = wOrd.rowsBetween(-(windowStop - 1), 0)
    val qualStart = min(when(startCond, 1).otherwise(0)).over(wStart) === 1 &&
      row_number().over(wOrd) >= windowStart
    val qualStop = min(when(stopCond, 1).otherwise(0)).over(wStop) === 1 &&
      row_number().over(wOrd) >= windowStop
    // marker: 1 = entered event, 0 = left event; stop wins on simultaneous
    val marked = df.withColumn("_marker",
      when(qualStop, 0).otherwise(when(qualStart, 1)))
    marked.withColumn("in_event",
        coalesce(last(col("_marker"), ignoreNulls = true)
          .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)), lit(0)) === 1)
      .drop("_marker")
  }

  /** Per-event records (run_length.py:1760 `find_events` /
    * generic.py:1740 `thresholded_events`): one output row per event with
    * length, start/end, and the sum of `value` inside the event. Long-format
    * event table (better than the reference's padded `event` dim).
    */
  def findEvents(df: DataFrame, keys: Seq[String], order: Column,
                 startCond: Column, windowStart: Int,
                 stopCond: Column, windowStop: Int,
                 value: Column): DataFrame = {
    val state = runsWithHoles(df, keys, order, startCond, windowStart, stopCond, windowStop)
    runTable(state, keys, order, col("in_event"),
      Seq(sum(value).as("event_sum"), sum(when(startCond, 1).otherwise(0)).as("event_effective_length")))
      .withColumnRenamed("_run_id", "event_id")
      .withColumnRenamed("run_start", "event_start")
      .withColumnRenamed("run_end", "event_end")
      .withColumnRenamed("run_len", "event_length")
  }

  /** Date-constrained run searches (run_length.py:1148-1334
    * `first_run_after_date` / `last_run_before_date` /
    * `run_end_after_date` family): the doy predicate masks the search
    * region, then the run machinery applies unchanged. */
  def firstRunAfterDate(df: DataFrame, keys: Seq[String], order: Column,
                        cond: Column, window: Int, afterDoy: Int): DataFrame =
    firstRun(df.filter(dayofyear(order) >= afterDoy), keys, order, cond, window)

  def lastRunBeforeDate(df: DataFrame, keys: Seq[String], order: Column,
                        cond: Column, window: Int, beforeDoy: Int): DataFrame =
    lastRun(df.filter(dayofyear(order) <= beforeDoy), keys, order, cond, window)

  /** first_run_before_date (run_length.py:1287): the reference masks only
    * at/after `date + window - 1` steps, so a qualifying run may BEGIN just
    * before the date and complete up to `window - 1` steps after it — and a
    * `window`-length run inside the kept rows necessarily begins strictly
    * before the date, so no extra start-doy gate is needed. */
  def firstRunBeforeDate(df: DataFrame, keys: Seq[String], order: Column,
                         cond: Column, window: Int, beforeDoy: Int): DataFrame =
    firstRun(df.filter(dayofyear(order) < beforeDoy + window - 1), keys, order, cond, window)

  /** run_end_after_date (run_length.py:1148): the "end of season" search.
    * Returns the first step of the first `window`-length run of
    * NON-qualifying rows at/after `afterDoy` (the reference's "first item
    * after the end of a run"), but only for entities where a `window`-length
    * qualifying run exists strictly BEFORE the date; when the qualifying
    * state never terminates within the period, falls back to the entity's
    * last timestep (matching `xr.where(end.isnull() & beg.notnull(), last,
    * end)`). Entities with no pre-date qualifying run emit no row (NaN in
    * the reference). */
  def runEndAfterDate(df: DataFrame, keys: Seq[String], order: Column,
                      cond: Column, window: Int, afterDoy: Int): DataFrame = {
    val beg = firstRun(df.filter(dayofyear(order) < afterDoy), keys, order, cond, window)
      .select(keys.map(col): _*)
    val end = firstRun(df.filter(dayofyear(order) >= afterDoy), keys, order, !cond, window)
      .withColumnRenamed("first_run_start", "_end_start")
    val lastTs = df.groupBy(keys.map(col): _*).agg(max(order).as("_last"))
    beg.join(end, keys, "left").join(lastTs, keys, "left")
      .select((keys.map(col) :+
        coalesce(col("_end_start"), col("_last")).as("run_end_after_date")): _*)
  }

  /** Values repeating >= `window` times (QA flag, run_length.py:1717
    * `suspicious_run`). Returns the run table of repeats. */
  def suspiciousRuns(df: DataFrame, keys: Seq[String], order: Column, value: Column,
                     window: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
    val rep = df.withColumn("_same", value <=> lag(value, 1).over(w))
    // a run of n equal values has n-1 consecutive _same rows; count the value row itself
    runTable(rep, keys, order, col("_same"))
      .withColumn("repeat_len", col("run_len") + 1)
      .filter(col("repeat_len") >= window)
      .drop("run_len", "_same")
  }
}
