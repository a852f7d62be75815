package graft.ensembles

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Uncertainty partitioning (`xclim/ensembles/_partitioning.py:57`
  * `hawkins_sutton`, :284 `general_partition`): split projection variance
  * at each time into model uncertainty (variance of per-model means) and
  * scenario/internal uncertainty (mean of within-model variances).
  *
  * Two stacked aggregations sharing one shuffle tree: (time, model) partials
  * then (time) — at scale this is a pair of hash-aggs over the ensemble
  * long frame, no collect.
  */
object Partitioning {

  /** Output: per `timeCol`: model_uncertainty (var of model means),
    * internal_uncertainty (mean of within-model vars), total (their sum —
    * the law-of-total-variance split). */
  def hawkinsSutton(df: DataFrame, timeCol: String, modelCol: String,
                    valueCol: String): DataFrame = {
    val perModel = df.groupBy(col(timeCol), col(modelCol))
      .agg(avg(col(valueCol)).as("_m"), var_pop(col(valueCol)).as("_v"))
    perModel.groupBy(col(timeCol))
      .agg(var_pop(col("_m")).as("model_uncertainty"),
        avg(col("_v")).as("internal_uncertainty"))
      .withColumn("total_uncertainty",
        col("model_uncertainty") + col("internal_uncertainty"))
  }
}
