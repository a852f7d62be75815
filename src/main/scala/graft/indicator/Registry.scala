package graft.indicator

import graft.core.{Runs, Time}
import graft.indices.Generic
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Indicator registry (`xclim/core/indicator.py:281` `registry`) plus the
  * built-in generic compute bases that config-defined ("virtual")
  * indicators reference by name — the Spark twin of resolving `compute` from
  * `xclim.indices.generic` in `Indicator.from_dict` (indicator.py:788-795).
  */
object Registry {

  private val reg = scala.collection.concurrent.TrieMap.empty[String, Indicator]

  def register(i: Indicator): Indicator = { reg.put(i.spec.identifier, i); i }
  def apply(identifier: String): Indicator =
    reg.getOrElse(identifier, throw new NoSuchElementException(
      s"no indicator '$identifier'; known: ${reg.keys.toSeq.sorted.mkString(", ")}"))
  def get(identifier: String): Option[Indicator] = reg.get(identifier)
  def names: Seq[String] = reg.keys.toSeq.sorted

  /** Generic compute bases, keyed by the names configs may reference. Each
    * is (df, freq, params) -> (location_id, period, value). */
  val computeBases: Map[String, (DataFrame, String, Map[String, String]) => DataFrame] = Map(
    "resample_mean" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(avg(col(p.getOrElse("var", "value"))).as("value")))),
    "resample_max" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(max(col(p.getOrElse("var", "value"))).as("value")))),
    "resample_min" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(min(col(p.getOrElse("var", "value"))).as("value")))),
    "resample_sum" -> ((df, freq, p) =>
      Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
        Seq(sum(col(p.getOrElse("var", "value"))).as("value")))),
    "threshold_count" -> ((df, freq, p) =>
      Generic.thresholdCount(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
        lit(p.getOrElse("thresh", "0").toDouble), "value")),
    "domain_count" -> ((df, freq, p) =>
      Generic.domainCount(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")),
        lit(p.getOrElse("low", "0").toDouble), lit(p.getOrElse("high", "0").toDouble), "value")),
    "cumulative_difference" -> ((df, freq, p) =>
      Generic.cumulativeDifference(df, Seq("location_id"), col("time"), freq,
        col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
        lit(p.getOrElse("thresh", "0").toDouble), "value")),
    "spell_length_max" -> ((df, freq, p) =>
      Generic.spellLengthStatistics(df, Seq("location_id"), col("time"), freq,
          Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
            lit(p.getOrElse("thresh", "0").toDouble)),
          "max", p.getOrElse("window", "1").toInt)
        .withColumnRenamed("run_max", "value")),
    "first_occurrence" -> ((df, freq, p) =>
      Generic.firstOccurrence(df, Seq("location_id"), col("time"), freq,
          Generic.compare(col(p.getOrElse("var", "value")), p.getOrElse("op", ">"),
            lit(p.getOrElse("thresh", "0").toDouble)), "value")))

  /** Instantiate + register an indicator from a spec and a compute-base
    * name with bound parameters (the `Indicator.from_dict` path). */
  def fromConfig(spec: IndicatorSpec, base: String,
                 bound: Map[String, String]): Indicator = {
    val fn = computeBases.getOrElse(base,
      throw new IllegalArgumentException(
        s"unknown compute base '$base'; known: ${computeBases.keys.toSeq.sorted.mkString(", ")}"))
    register(new Indicator(spec) {
      protected def compute(df: DataFrame, freq: String, params: Map[String, String]): DataFrame =
        fn(df, freq, bound ++ params)
    })
  }

  // ---- built-in indicators (the _simple.py reducer family) ----
  def registerBuiltins(): Unit = {
    val tasReq = Seq(VarReq("value", "[temperature]", "K"))
    fromConfig(IndicatorSpec("tg_mean", "Mean daily mean temperature", "K",
      standardName = "air_temperature", cellMethods = "time: mean", inputs = tasReq),
      "resample_mean", Map.empty)
    fromConfig(IndicatorSpec("tx_max", "Maximum daily maximum temperature", "K",
      standardName = "air_temperature", cellMethods = "time: maximum", inputs = tasReq),
      "resample_max", Map.empty)
    fromConfig(IndicatorSpec("tn_min", "Minimum daily minimum temperature", "K",
      standardName = "air_temperature", cellMethods = "time: minimum", inputs = tasReq),
      "resample_min", Map.empty)
    fromConfig(IndicatorSpec("tx_days_above", "Days with tasmax above threshold", "d",
      standardName = "air_temperature", inputs = tasReq),
      "threshold_count", Map("op" -> ">", "thresh" -> "298.15"))
    fromConfig(IndicatorSpec("growing_degree_days", "Growing degree days", "K d",
      inputs = tasReq),
      "cumulative_difference", Map("op" -> ">", "thresh" -> "277.15"))
    fromConfig(IndicatorSpec("heat_wave_index", "Max heat spell length", "d",
      inputs = tasReq, missing = "skip"),
      "spell_length_max", Map("op" -> ">", "thresh" -> "298.15", "window" -> "5"))
  }
}
