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

  /** Return levels via an L-moment (PWM) fit — `fa(..., dist="genextreme" |
    * "gumbel_r", method="PWM")`. One collect of the block extremes per
    * entity (state bounded by the number of blocks, e.g. #years), then the
    * closed-form Hosking parameter map and quantile — both codegen'd.
    * `ts` are return periods in block units; output one row per (keys, T). */
  def returnLevelLmom(df: DataFrame, keys: Seq[String], time: Column, value: Column,
                      ts: Seq[Double], dist: String, freq: String = "YS",
                      mode: String = "max", quantize: Int = -1): DataFrame = {
    val blockRed = mode match {
      case "max" => max(value)
      case "min" => min(value)
      case other => throw new IllegalArgumentException(s"bad mode: $other")
    }
    def q(c: Column): Column =
      if (quantize >= 0) Distributions.qGrid(c, quantize) else c
    val blocks = df
      .groupBy((keys.map(col) :+ Time.resamplePeriod(time, freq).as("period")): _*)
      .agg(blockRed.as("extreme"))
    val sorted = blocks
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("extreme"))).as("_arr"),
        count(lit(1)).as("n_blocks"))
    val (l1r, l2r, t3r) = graft.core.Stats.lMoments(col("_arr"))
    val withMoments = sorted
      .withColumn("l1", q(l1r)).withColumn("l2", q(l2r))
      .withColumn("t3", q(t3r)).drop("_arr")
    val withParams = dist match {
      case "genextreme" =>
        val (k, alpha, xi) = Distributions.gevLmom(col("l1"), col("l2"), col("t3"), quantize)
        withMoments.withColumn("shape", k).withColumn("scale", alpha).withColumn("loc", xi)
      case "gumbel_r" =>
        val (alpha, xi) = Distributions.gumbelLmom(col("l1"), col("l2"))
        withMoments.withColumn("shape", lit(0.0)).withColumn("scale", alpha).withColumn("loc", xi)
      case other => throw new IllegalArgumentException(s"unsupported PWM dist: $other")
    }
    val tExpr = explode(array(ts.map(lit): _*)).as("t_years")
    val e = withParams.select((keys.map(col) :+ col("n_blocks") :+ col("shape") :+
      col("scale") :+ col("loc") :+ tExpr): _*)
    val p = when(lit(mode == "max"), lit(1.0) - lit(1.0) / col("t_years"))
      .otherwise(lit(1.0) / col("t_years"))
    e.withColumn("return_level", dist match {
      case "genextreme" => Distributions.gevQuantile(p, col("shape"), col("scale"), col("loc"))
      case "gumbel_r"   => Distributions.gumbelQuantile(p, col("scale"), col("loc"))
    })
  }
}
