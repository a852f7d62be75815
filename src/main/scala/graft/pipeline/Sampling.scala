package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Every operator here
  * is RNG-free: the sample is a pure function of (row identity, salt), so
  * it is reproducible across runs, retries, partitionings and cluster
  * sizes — the property that makes 100 TB pipeline re-runs and A/B data
  * ablations auditable. (Spark's `df.sample` is seed-stable only for a
  * fixed partitioning; these are stable, period.)
  */
object Sampling {

  /** Uniform [0,1) fraction from a salted md5 of the row id — the shared
    * primitive. First 13 hex digits = 52 bits, exactly representable in a
    * double, identically computable in any SQL engine. */
  def hashFraction(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0) // 2^52

  /** Bernoulli(p) sample: keep rows whose hash fraction < p. One scan, no
    * shuffle, deterministic membership. */
  def hashSample(df: DataFrame, id: Column, p: Double, salt: String = "graft"): DataFrame =
    df.filter(hashFraction(id, salt) < p)

  /** Stratified fixed-size sample: exactly min(k, |stratum|) rows per
    * stratum, chosen by hash rank (ties impossible modulo md5 collisions).
    * One shuffle on the stratum key; the window sort spills, so strata of
    * any size stay memory-bounded. For k << |stratum| at extreme scale,
    * pre-filter with `hashSample` at a safe over-rate first to shrink the
    * sort input. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], id: Column, k: Int,
                       salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashFraction(id, salt), id)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k).drop("_rk")
  }
}
