package graft.indices

import graft.functions.SpecialFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standardized indices — standardized_precipitation_index (SPI,
  * _agro.py:987), SPEI, standardized_streamflow_index and
  * standardized_groundwater_index (_hydrology.py:136,:447 — same pipeline,
  * different variable/distribution defaults) machinery (stats.py:770
  * `preprocess_standardized_index`, :839 `standardized_index_fit_params`,
  * :971 `standardized_index`): accumulate over a rolling window, fit a
  * zero-inflated gamma per (entity, calendar group), map through the fitted
  * CDF, and transform to standard-normal quantiles, clipped to ±8.21.
  *
  * Fit is method-of-moments (one of the reference's supported methods) so
  * the whole pipeline stays in aggregates + codegen'd expressions
  * (`GammaCdf`/`Probit` native expressions) — two shuffles total: the
  * rolling-window sort and the climatology aggregate (broadcast-joined
  * back).
  */
object Standardized {

  /** SPI over a daily frame. `groupExpr` is the calendar pool for the fit
    * (the reference uses doy or month; pass a constant for a single pool).
    */
  def spi(daily: DataFrame, keys: Seq[String], dateCol: String, valueCol: String,
          window: Int, groupExpr: Column = lit(0)): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val acc = daily
      .withColumn("_rn", row_number().over(w))
      .withColumn("_acc", sum(col(valueCol)).over(w.rowsBetween(-(window - 1), 0)))
      .filter(col("_rn") >= window)
      .withColumn("_grp", groupExpr)
    // zero-inflated gamma fit per (keys, group): q0 = P(acc == 0), gamma MM
    // on the positive part
    val pos = when(col("_acc") > 0, col("_acc"))
    val fit = acc.groupBy((keys.map(col) :+ col("_grp")): _*).agg(
      avg(when(col("_acc") <= 0, 1.0).otherwise(0.0)).as("_q0"),
      avg(pos).as("_m"),
      var_pop(pos).as("_v"))
      .withColumn("_shape", col("_m") * col("_m") / col("_v"))
      .withColumn("_scale", col("_v") / col("_m"))
    val joined = acc.join(broadcast(fit), keys :+ "_grp")
    val cdf = col("_q0") + (lit(1.0) - col("_q0")) *
      SpecialFunctions.gammaCdf(col("_acc"), col("_shape"), col("_scale"))
    joined
      .withColumn("spi", greatest(least(
        SpecialFunctions.probit(cdf), lit(8.21)), lit(-8.21)))
      .select((keys.map(col) :+ col(dateCol) :+ col("_acc").as("accumulated") :+ col("spi")): _*)
  }
}
