package graft.indices

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synoptic dynamics — `xclim/indices/_synoptic.py:33
  * jetstream_metric_woollings`: 10-day low-pass Lanczos filter of the zonal
  * wind, then the latitude and strength of the daily wind maximum.
  *
  * The filter is a fixed-coefficient FIR evaluated as a lag/lead dot
  * product (pure window projection over one entity sort — the
  * `q_weighted_rolling` plan shape); the weights are the standard Lanczos
  * low-pass form w_k = sinc(2 f_c k) sinc(k/(n+1)) (Duchon 1979), the same
  * construction the reference takes from its `lanczos_filter` helper.
  * The jet position is a per-day argmax over the latitude dimension
  * (struct-ordered max_by; one hash-agg).
  */
object Synoptic {

  /** Symmetric Lanczos low-pass weights for a `window`-point filter at
    * cut-off frequency `cutoff` (cycles/step), normalised to sum 1. */
  def lanczosWeights(window: Int, cutoff: Double): Array[Double] = {
    val n = (window - 1) / 2
    def sinc(x: Double): Double = if (x == 0.0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
    val raw = (-n to n).map(k => 2.0 * cutoff * sinc(2.0 * cutoff * k) * sinc(k.toDouble / (n + 1)))
    val s = raw.sum
    raw.map(_ / s).toArray
  }

  /** Centered FIR over the (keys)-sorted series: sum_k w_k x_{t+k-n}.
    * Only full windows yield values (edges null). */
  def lanczosLowPass(df: DataFrame, keys: Seq[String], order: Column, v: Column,
                     weights: Array[Double], as: String): DataFrame = {
    val n = (weights.length - 1) / 2
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val terms = weights.zipWithIndex.map { case (wk, i) =>
      val k = i - n
      val shifted = if (k < 0) lag(v, -k).over(w) else if (k > 0) lead(v, k).over(w) else v
      lit(wk) * shifted
    }
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(wAll))
      .withColumn(as,
        when(col("_rn") > n && col("_rn") <= col("_cnt") - n,
          terms.reduceLeft(_ + _)))
      .drop("_rn", "_cnt")
  }

  /** Jet latitude + strength per time step: argmax of the filtered wind
    * over the latitude dimension (ties -> lowest latitude). */
  def jetLatitudeStrength(filtered: DataFrame, timeCol: String, latCol: String,
                          filteredCol: String): DataFrame =
    filtered.filter(col(filteredCol).isNotNull)
      .groupBy(col(timeCol))
      .agg(
        max_by(col(latCol), struct(col(filteredCol), (lit(0.0) - col(latCol)).as("_l")))
          .as("jet_lat"),
        max(col(filteredCol)).as("jet_strength"))
}
