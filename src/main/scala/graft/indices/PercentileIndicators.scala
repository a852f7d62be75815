package graft.indices

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Climatological-percentile indicator family (`_multivariate.py`):
  * tx90p/tn10p/tg90p/... (`:1300-1654`) and the warm/cold spell duration
  * indices WSDI/CSDI (`:69,:1719`). All of them are "compare each day to its
  * day-of-year climatological percentile" shapes:
  *
  *   1. `Season.doyPercentile` — one fan-out + hash-agg shuffle builds the
  *      (entity, doy) percentile table (years x (2w+1) pool per group);
  *   2. an equi-join back onto the daily series on (entity, doy) — the doy
  *      table is ~366 rows/entity, co-partitioned on the same key, so the
  *      join reuses the exchange and never broadcasts the big side;
  *   3. a threshold count (tx90p) or calendar-day run analysis (WSDI/CSDI)
  *      per resample period.
  *
  * The bootstrap decorator (`core/bootstrap.py`, Zhang 2005) composes via
  * `core.Bootstrap.replicas` over the base-period years before step 1.
  */
object PercentileIndicators {

  /** tx90p family: per (entity, period) count of days where `value` `op` its
    * doy-percentile (exceedance count; `asPercent` divides by period days,
    * matching the reference's percent-units variants). */
  def doyExceedance(df: DataFrame, keys: Seq[String], dateCol: String, value: String,
                    p: Double, op: String, halfWindow: Int, freq: String,
                    asPercent: Boolean = false,
                    alpha: Double = 1.0 / 3.0, beta: Double = 1.0 / 3.0,
                    broadcastDim: Boolean = true): DataFrame = {
    val pct = Season.doyPercentile(df, keys, dateCol, value, halfWindow, p, alpha, beta)
    // fold leap doy 366 onto the 365-day percentile grid (as the pool does)
    val joined = df.withColumn("doy", ((dayofyear(col(dateCol)) - 1) % 365) + 1)
      // the (entity x 365) percentile table broadcasts when entities are
      // station-scale; pass broadcastDim=false at grid scale (millions of
      // cells) to let AQE pick a co-partitioned join instead
      .join(if (broadcastDim) broadcast(pct) else pct, keys :+ "doy")
    val cond = Generic.compare(col(value), op, col("doy_pct"))
    val agg =
      if (asPercent) (sum(when(cond, 1.0)).cast("double") / count(lit(1)) * 100.0).as("value")
      else coalesce(sum(when(cond, 1L)), lit(0L)).as("value")
    Generic.resampleOp(joined, keys, col(dateCol), freq, Seq(agg))
  }

  /** tx90p with the Zhang-2005 in-base bootstrap (`@percentile_bootstrap`,
    * core/bootstrapping.py:22-211): for each base-period year y the
    * exceedance count is recomputed against n-1 replica climatologies (y's
    * data replaced by each other base year in turn) and averaged. One
    * unioned replica plan: the percentile table is built per
    * (entity, y_out, y_in, doy) in a single two-phase pooled aggregation;
    * the exceedance join fans each daily row to its n-1 replicas — the
    * quadratic replica cost is inherent to the method (the reference warns
    * the same) and bounded by the base-period length, never the data. */
  def doyExceedanceBootstrap(df: DataFrame, keys: Seq[String], dateCol: String,
                             value: String, p: Double, op: String, halfWindow: Int,
                             baseYears: Seq[Int],
                             alpha: Double = 1.0 / 3.0, beta: Double = 1.0 / 3.0): DataFrame = {
    val base = df.filter(year(col(dateCol)).isin(baseYears.map(Integer.valueOf): _*))
    val reps = graft.core.Bootstrap.replicas(base, year(col(dateCol)), baseYears)
    val pct = Season.doyPercentile(reps,
      keys ++ Seq("bootstrap_y_out", "bootstrap_y_in"), dateCol, value,
      halfWindow, p, alpha, beta)
    val rows = base
      .withColumn("doy", ((dayofyear(col(dateCol)) - 1) % 365) + 1)
      .withColumn("_y", year(col(dateCol)))
    val joined = rows.join(pct,
      keys.map(k => rows(k) === pct(k)).reduce(_ && _) &&
        col("_y") === col("bootstrap_y_out") && rows("doy") === pct("doy"))
    val cond = Generic.compare(rows(value), op, col("doy_pct"))
    joined
      .groupBy((keys.map(rows(_)) :+ col("_y") :+ col("bootstrap_y_in")): _*)
      .agg(coalesce(sum(when(cond, 1L)), lit(0L)).as("_cnt"))
      .groupBy((keys.map(col) :+ col("_y").as("y")): _*)
      .agg(avg(col("_cnt")).as("value"), count(lit(1)).as("n_replicas"))
  }

  /** WSDI/CSDI: per (entity, period) total days inside runs of at least
    * `window` CONSECUTIVE CALENDAR days with `value` `op` its
    * doy-percentile. Runs are keyed on day-number minus row-number so gaps
    * in the daily series break them. Periods are assigned by run START
    * (resample-then-runlength order). */
  def doySpellDuration(df: DataFrame, keys: Seq[String], dateCol: String, value: String,
                       p: Double, op: String, halfWindow: Int, window: Int, freq: String,
                       alpha: Double = 1.0 / 3.0, beta: Double = 1.0 / 3.0,
                       broadcastDim: Boolean = true): DataFrame = {
    val pct = Season.doyPercentile(df, keys, dateCol, value, halfWindow, p, alpha, beta)
    val joined = df.withColumn("doy", ((dayofyear(col(dateCol)) - 1) % 365) + 1)
      // the (entity x 365) percentile table broadcasts when entities are
      // station-scale; pass broadcastDim=false at grid scale (millions of
      // cells) to let AQE pick a co-partitioned join instead
      .join(if (broadcastDim) broadcast(pct) else pct, keys :+ "doy")
    val cond = Generic.compare(col(value), op, col("doy_pct"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val runs = joined.filter(cond)
      .withColumn("_grp",
        datediff(col(dateCol), to_date(lit("1970-01-01"))) - row_number().over(w))
      .groupBy((keys.map(col) :+ col("_grp")): _*)
      .agg(min(col(dateCol)).as("_run_start"), count(lit(1)).as("_len"))
      .filter(col("_len") >= window)
    Generic.resampleOp(runs, keys, col("_run_start"), freq,
      Seq(coalesce(sum(col("_len")), lit(0L)).as("value")))
  }
}
