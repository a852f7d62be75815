package graft.indices

import graft.core.Time
import graft.functions.SpecialFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Return-period analysis (`xclim/indices/stats.py:429` `fa` / :485
  * `frequency_analysis`): resample to block extremes (annual max by
  * default), fit a distribution per entity, evaluate the quantile at
  * 1 - 1/T (mode "max") or 1/T (mode "min").
  *
  * The fit is the distributed gamma MLE (only avg and avg-log aggregates
  * cross the shuffle; the Newton solve runs as a codegen'd scalar on the
  * aggregated row), and the ppf is the native GammaPInv expression — the
  * whole chain is two hash-aggs, no driver loops, no collected samples.
  */
object FrequencyAnalysis {

  /** Per-entity T-year return level of the `freq`-block maxima of `value`.
    * Output: keys..., shape, scale, return_level. */
  def returnLevel(df: DataFrame, keys: Seq[String], time: Column, value: Column,
                  t: Double, freq: String = "YS", mode: String = "max"): DataFrame = {
    val blockRed = mode match {
      case "max" => max(value)
      case "min" => min(value)
      case other => throw new IllegalArgumentException(s"bad mode: $other")
    }
    val blocks = df
      .groupBy((keys.map(col) :+ Time.resamplePeriod(time, freq).as("period")): _*)
      .agg(blockRed.as("extreme"))
    val p = if (mode == "max") 1.0 - 1.0 / t else 1.0 / t
    blocks
      .filter(col("extreme") > 0) // gamma support
      .groupBy(keys.map(col): _*)
      .agg(avg(col("extreme")).as("_m"),
        avg(log(col("extreme"))).as("_ml"),
        count(lit(1)).as("n_blocks"))
      .withColumn("shape", SpecialFunctions.gammaMleShape(col("_m"), col("_ml")))
      .withColumn("scale", col("_m") / col("shape"))
      .withColumn("return_level",
        SpecialFunctions.gammaPpf(lit(p), col("shape"), col("scale")))
      .drop("_m", "_ml")
  }
}
