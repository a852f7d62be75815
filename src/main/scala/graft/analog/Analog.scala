package graft.analog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial-analog dissimilarity metrics (`xclim/analog.py:21`
  * `spatial_analogs` + metrics :182-:640): compare a target sample's
  * distribution against each candidate group's distribution.
  *
  * The two-sample Kolmogorov–Smirnov statistic (analog.py:434) is expressed
  * as a pure window plan: union the target sample into every candidate
  * group, sort by value, and take max |ecdf_a - ecdf_b| with a RANGE frame
  * so ties are evaluated after all equal values. One shuffle keyed on the
  * candidate group; no sample ever sits in driver memory, so candidate
  * count and sample sizes scale freely.
  */
object Analog {

  /** Per-group two-sample KS statistic of `value` against the target frame
    * (single column named like valueCol). Output: (groupCol, ks). */
  def ksStatistic(candidates: DataFrame, groupCol: String, valueCol: String,
                  target: DataFrame): DataFrame = {
    val groups = candidates.select(col(groupCol)).distinct()
    val a = candidates.select(col(groupCol), col(valueCol).as("_v"),
      lit(1L).as("_a"), lit(0L).as("_b"))
    val b = target.select(col(valueCol).as("_v"))
      .crossJoin(broadcast(groups))
      .select(col(groupCol), col("_v"), lit(0L).as("_a"), lit(1L).as("_b"))
    val u = a.unionByName(b)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col(groupCol))
    u.withColumn("_ca", sum(col("_a")).over(w))
      .withColumn("_cb", sum(col("_b")).over(w))
      .withColumn("_na", sum(col("_a")).over(wg))
      .withColumn("_nb", sum(col("_b")).over(wg))
      .groupBy(col(groupCol))
      .agg(max(abs(col("_ca").cast("double") / col("_na") -
        col("_cb").cast("double") / col("_nb"))).as("ks"))
  }

  /** Standardised Euclidean distance between group means scaled by target
    * std (analog.py:182 `seuclidean`, 1-D form). */
  def seuclidean(candMean: Column, tgtMean: Column, tgtStd: Column): Column =
    abs(candMean - tgtMean) / tgtStd
}
