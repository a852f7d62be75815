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
    // ONE full-data shuffle: per (keys, year, doy) value arrays. The
    // replica x (2w+1) fan-out then runs over this aggregated table
    // (years x 365 rows per entity), never over raw rows — the quadratic
    // bootstrap cost multiplies kilobytes, not the dataset.
    val byDoy = base
      .select((keys.map(col) :+ year(col(dateCol)).as("_y") :+
        dayofyear(col(dateCol)).as("_doy") :+ col(value).as("_v")): _*)
      .groupBy((keys.map(col) :+ col("_y") :+ col("_doy")): _*)
      .agg(collect_list(col("_v")).as("_arr"))
    val fanned = byDoy
      .withColumn("_tdoy",
        explode(sequence(col("_doy") - halfWindow, col("_doy") + halfWindow)))
      .withColumn("doy", ((col("_tdoy") + 364) % 365) + 1)
    val pairs = for { o <- baseYears; i <- baseYears if i != o } yield (o, i)
    val pairArr = array(pairs.map { case (o, i) =>
      struct(lit(o).as("y_out"), lit(i).as("y_in"))
    }: _*)
    val reps = fanned
      .withColumn("_pair", explode(pairArr))
      .withColumn("_copies",
        when(col("_y") === col("_pair.y_out"), 0)
          .when(col("_y") === col("_pair.y_in"), 2).otherwise(1))
      .filter(col("_copies") > 0)
      .withColumn("_dup", explode(sequence(lit(1), col("_copies"))))
    val pooled = reps
      .groupBy((keys.map(col) :+ col("_pair.y_out").as("bootstrap_y_out") :+
        col("_pair.y_in").as("bootstrap_y_in") :+ col("doy")): _*)
      .agg(sort_array(flatten(collect_list(col("_arr")))).as("_all"))
    val pct = pooled.select((keys.map(col) :+ col("bootstrap_y_out") :+
      col("bootstrap_y_in") :+ col("doy") :+
      graft.core.Stats.hfQuantileOfSorted(col("_all"), p, alpha, beta).as("doy_pct")): _*)
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
