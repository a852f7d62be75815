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

  /** Climatological per-day-of-year percentile over a +-halfWindow day pool
    * (`percentile_doy`, calendar.py:396-494): for each (entity, day) the
    * p-quantile of `value` over all rows within the window. Self-join
    * formulation; the pool per group is bounded (window x years), so the
    * aggregate state stays small at any scale. Quantile is exact type 7
    * (alpha=beta=1) to match SQL engines; use Stats.hfQuantile for the
    * reference's type-8 default. */
  def doyPercentile(daily: DataFrame, keys: Seq[String], dateCol: String,
                    value: String, halfWindow: Int, p: Double): DataFrame = {
    val pool = daily.select((keys.map(col) :+ col(dateCol).as("_pool_d") :+ col(value).as("_pool_v")): _*)
    val anchor = daily.select((keys.map(col) :+ col(dateCol)).distinct: _*).distinct()
    anchor.join(pool, keys)
      .filter(col("_pool_d").between(date_sub(col(dateCol), halfWindow),
        date_add(col(dateCol), halfWindow)))
      .groupBy((keys.map(col) :+ col(dateCol)): _*)
      .agg(percentile(col("_pool_v"), lit(p)).as("doy_pct"))
  }
}
