package graft.indices

import graft.core.Runs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Season-bound operators (run_length.py:891-1147 `season_start` /
  * `season_end` / `season_length`; growing_season_* `_threshold.py:975-1184`):
  * a season starts at the first run of `window` qualifying rows, and ends at
  * the first run of `window` inverse rows strictly after `midDate`.
  *
  * Two passes over the same islands plan (Catalyst reuses the entity-keyed
  * exchange), joined per entity — no driver iteration.
  */
/* Covers season / season_length_from_boundaries (generic.py:770,:856). */
object Season {

  /** Per-entity (keys) season bounds from a daily frame.
    * @param cond     qualifying condition (e.g. total > thresh)
    * @param window   consecutive days to open (and to close) the season
    * @param midDate  closing runs must START on or after this date column
    * @return keys..., season_start DATE, season_end DATE (nullable),
    *         season_length INT (rows from start to end-1, or to series end)
    */
  def seasonBounds(df: DataFrame, keys: Seq[String], dateCol: Column,
                   cond: Column, window: Int, midDate: Column): DataFrame = {
    val starts = Runs.firstRun(df, keys, dateCol, cond, window)
      .withColumnRenamed("first_run_start", "season_start")
    val endRuns = Runs.runTable(df.filter(dateCol >= midDate), keys, dateCol, !cond)
      .filter(col("run_len") >= window)
      .groupBy(keys.map(col): _*)
      .agg(min(col("run_start")).as("season_end"))
    val lastDay = df.groupBy(keys.map(col): _*).agg(max(dateCol).as("_last_day"))
    starts
      .join(endRuns, keys, "left")
      .join(lastDay, keys, "left")
      .withColumn("season_length",
        when(col("season_end").isNotNull,
          datediff(col("season_end"), col("season_start")))
          .otherwise(datediff(col("_last_day"), col("season_start")) + 1))
      .drop("_last_day")
  }

  /** Climatological day-of-year percentile (`percentile_doy`,
    * calendar.py:396-494): for each (entity, doy) the p-quantile of `value`
    * pooled over the SAME day-of-year across ALL years, +-halfWindow days,
    * with year-boundary wraparound (doy 1 pools 364..365 and 1..3 at w=2;
    * leap doy 366 folds onto doy 1).
    *
    * Spark mapping: each row fans out to the 2w+1 target doys it
    * contributes to (`explode(sequence)`), then ONE hash-agg shuffle keyed
    * (entity, doy). Pool size per group is years x (2w+1) — bounded at any
    * corpus scale, so the aggregation buffer stays small; no window over the
    * full series, no per-date self-join.
    *
    * alpha=beta=1/3 is Hyndman-Fan type 8 (the reference default);
    * alpha=beta=1 is type 7, computed with the built-in `percentile` for
    * exact SQL-engine parity. Output: keys..., doy INT, doy_pct DOUBLE. */
  def doyPercentile(daily: DataFrame, keys: Seq[String], dateCol: String,
                    value: String, halfWindow: Int, p: Double,
                    alpha: Double = 1.0 / 3.0, beta: Double = 1.0 / 3.0): DataFrame = {
    // two-phase pooling: collapse to one array per (entity, exact doy)
    // FIRST (the only full-data shuffle, map-side combinable), then fan the
    // 365-row-per-entity doy table out +-halfWindow and merge arrays. The
    // +-w fan-out never touches full-resolution rows, so shuffle volume is
    // 1x the data instead of (2w+1)x — the difference at 100 TB.
    val byDoy = daily
      .select((keys.map(col) :+ dayofyear(col(dateCol)).as("_doy") :+ col(value).as("_v")): _*)
      .groupBy((keys.map(col) :+ col("_doy")): _*)
      .agg(collect_list(col("_v")).as("_arr"))
    val contrib = byDoy
      .withColumn("_tdoy",
        explode(sequence(col("_doy") - halfWindow, col("_doy") + halfWindow)))
      .withColumn("doy", ((col("_tdoy") + 364) % 365) + 1)
    val pooled = contrib.groupBy((keys.map(col) :+ col("doy")): _*)
      .agg(sort_array(flatten(collect_list(col("_arr")))).as("_all"))
    val q =
      if (alpha == 1.0 && beta == 1.0)
        // Spark `percentile` type-7 formula: lower + d*(higher - lower),
        // which hfQuantileOfSorted reproduces exactly at alpha=beta=1
        graft.core.Stats.hfQuantileOfSorted(col("_all"), p, 1.0, 1.0)
      else graft.core.Stats.hfQuantileOfSorted(col("_all"), p, alpha, beta)
    pooled.select((keys.map(col) :+ col("doy") :+ q.as("doy_pct")): _*)
  }
}
