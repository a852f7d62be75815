package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zhang-2005 percentile bootstrap (`xclim/core/bootstrapping.py:22-211`
  * `percentile_bootstrap` / `bootstrap_func`): percentile-based indices are
  * biased inside their own reference period; for each in-base year, the
  * index is recomputed with that year's data replaced by each other base
  * year in turn, and the results averaged.
  *
  * Spark formulation: instead of the reference's driver loop over
  * recomputations, build ONE unioned plan tagged by `bootstrap_id` — the
  * replacement assignments become a (year -> bootstrap replica) mapping
  * exploded onto the input, so every replica shares the single scan and the
  * percentile aggregate runs per (replica, group) in one shuffle.
  * Embarrassingly parallel across replicas, exactly like the reference's
  * dask graph but without graph-size blowup.
  */
object Bootstrap {

  /** Expand an input frame into its bootstrap replicas for the in-base
    * period. For replica (y_out, y_in): rows of year y_out are dropped and
    * rows of year y_in are duplicated in its place.
    *
    * Output = input columns + `bootstrap_id` (string "yOut<-yIn").
    * Replica count is nYears*(nYears-1); the reference warns about the same
    * quadratic cost (bootstrapping.py:146-153).
    */
  def replicas(df: DataFrame, yearCol: Column, baseYears: Seq[Int]): DataFrame = {
    val pairs = for {
      yOut <- baseYears; yIn <- baseYears if yIn != yOut
    } yield (yOut, yIn)
    // each row participates in replica (yOut, yIn) iff its year != yOut,
    // duplicated when year == yIn (it stands in for both itself and yOut)
    val pairLits = array(pairs.map { case (o, i) =>
      struct(lit(o).as("y_out"), lit(i).as("y_in"))
    }: _*)
    df.withColumn("_pair", explode(pairLits))
      .withColumn("_copies",
        when(yearCol === col("_pair.y_out"), 0)
          .when(yearCol === col("_pair.y_in"), 2)
          .otherwise(1))
      .filter(col("_copies") > 0)
      .withColumn("_dup", explode(sequence(lit(1), col("_copies"))))
      .withColumn("bootstrap_id",
        concat(col("_pair.y_out").cast("string"), lit("<-"), col("_pair.y_in").cast("string")))
      .withColumn("bootstrap_y_out", col("_pair.y_out"))
      .withColumn("bootstrap_y_in", col("_pair.y_in"))
      .drop("_pair", "_copies", "_dup")
  }

  /** Average an index over its bootstrap replicas: group the per-replica
    * index results by everything except `bootstrap_id` and take the mean
    * (bootstrapping.py:188-205). */
  def average(perReplica: DataFrame, valueCol: String): DataFrame = {
    val keys = perReplica.columns.filter(c => c != valueCol && c != "bootstrap_id")
    perReplica.groupBy(keys.map(col): _*)
      .agg(avg(col(valueCol)).as(valueCol), count(lit(1)).as("n_replicas"))
  }
}
