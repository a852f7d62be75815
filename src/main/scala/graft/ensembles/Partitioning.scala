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

  /** `lafferty_sriver` (_partitioning.py:192, Lafferty & Sriver 2023):
    * partition the variance of an annual (time, scenario, model,
    * downscaling) ensemble into scenario / model / downscaling / internal
    * variability.
    *
    * The forced response `sm` is a centered rolling mean of width
    * `smoothWindow` per member (the reference fits a 4th-order polynomial
    * by default but explicitly accepts any smoother; a rolling mean keeps
    * the whole pipeline declarative). Internal variability is the centered
    * rolling variance (same width) of the residuals, averaged over members.
    * Population variances throughout (xarray `.var()` is ddof=0); weighted
    * means over member counts reproduce the reference's `weighted(count)`
    * means.
    *
    * One window pass per member + three stacked hash-aggs; no collect.
    * Output long-form: (timeCol, uncertainty, variance). */
  def laffertySriver(df: DataFrame, timeCol: String, scenarioCol: String,
                     modelCol: String, downscalingCol: String, valueCol: String,
                     smoothWindow: Int = 5): DataFrame = {
    val member = Seq(col(scenarioCol), col(modelCol), col(downscalingCol))
    val h = (smoothWindow - 1) / 2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(member: _*).orderBy(col(timeCol)).rowsBetween(-h, h)
    val smoothed = df
      .withColumn("_sm", avg(col(valueCol)).over(w))
      .withColumn("_nv", var_pop(col(valueCol) - avg(col(valueCol)).over(w)).over(w))
    // variability: mean over members of the rolling residual variance
    val nv = smoothed.groupBy(col(timeCol))
      .agg(avg(col("_nv")).as("variability"))
    // scenario: var over scenarios of the (model, downscaling) mean
    val scen = smoothed
      .groupBy(col(timeCol), col(scenarioCol)).agg(avg(col("_sm")).as("_m"))
      .groupBy(col(timeCol)).agg(var_pop(col("_m")).as("scenario"))
    // model: var over models per (scenario, downscaling), weighted mean by
    // model count
    val model = smoothed
      .groupBy(col(timeCol), col(scenarioCol), col(downscalingCol))
      .agg(var_pop(col("_sm")).as("_v"), count(lit(1)).as("_w"))
      .groupBy(col(timeCol))
      .agg((sum(col("_v") * col("_w")) / sum(col("_w"))).as("model"))
    val down = smoothed
      .groupBy(col(timeCol), col(scenarioCol), col(modelCol))
      .agg(var_pop(col("_sm")).as("_v"), count(lit(1)).as("_w"))
      .groupBy(col(timeCol))
      .agg((sum(col("_v") * col("_w")) / sum(col("_w"))).as("downscaling"))
    val joined = nv.join(scen, timeCol).join(model, timeCol).join(down, timeCol)
      .withColumn("total",
        col("variability") + col("scenario") + col("model") + col("downscaling"))
    joined.select(col(timeCol), explode(map(
      lit("variability"), col("variability"), lit("scenario"), col("scenario"),
      lit("model"), col("model"), lit("downscaling"), col("downscaling"),
      lit("total"), col("total"))).as(Seq("uncertainty", "variance")))
  }

  /** `general_partition` (_partitioning.py:284): law-of-total-variance
    * split over an arbitrary ordered list of dimensions — each listed dim
    * contributes the variance of its conditional means (conditioned on the
    * dims before it), and the residual within-cell variance is the
    * internal component. */
  def generalPartition(df: DataFrame, timeCol: String, dims: Seq[String],
                       valueCol: String): DataFrame = {
    val comps = dims.zipWithIndex.map { case (d, i) =>
      val conditioning = col(timeCol) +: dims.take(i).map(col)
      val means = df.groupBy((conditioning :+ col(d)): _*)
        .agg(avg(col(valueCol)).as("_m"))
      means.groupBy(conditioning: _*).agg(var_pop(col("_m")).as("_v"))
        .groupBy(col(timeCol)).agg(avg(col("_v")).as(s"u_$d"))
    }
    val internal = df.groupBy((col(timeCol) +: dims.map(col)): _*)
      .agg(var_pop(col(valueCol)).as("_v"))
      .groupBy(col(timeCol)).agg(avg(col("_v")).as("u_internal"))
    val joined = comps.foldLeft(internal)((acc, c) => acc.join(c, timeCol))
    val total = (dims.map(d => col(s"u_$d")) :+ col("u_internal")).reduce(_ + _)
    joined.withColumn("u_total", total)
  }

  /** `fractional_uncertainty` (_partitioning.py:404): each component as a
    * percentage of the total, over the long-form (uncertainty, variance)
    * output of [[laffertySriver]]. The per-time total re-joins via a
    * window over the time key — no second shuffle beyond the one the long
    * frame already carries. */
  def fractionalUncertainty(long: DataFrame, timeCol: String,
                            uncertaintyCol: String = "uncertainty",
                            varianceCol: String = "variance"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(timeCol))
    long
      .withColumn("_tot", max(when(col(uncertaintyCol) === "total",
        col(varianceCol))).over(w))
      .withColumn("fraction_pct", col(varianceCol) / col("_tot") * 100)
      .drop("_tot")
  }
}
