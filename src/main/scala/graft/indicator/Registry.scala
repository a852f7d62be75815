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
            lit(p.getOrElse("thresh", "0").toDouble)), "value")),
    "doy_percentile_count" -> ((df, freq, p) =>
      graft.indices.PercentileIndicators.doyExceedance(df, Seq("location_id"), "time",
        p.getOrElse("var", "value"), p.getOrElse("per", "0.9").toDouble,
        p.getOrElse("op", ">"), p.getOrElse("half_window", "2").toInt, freq,
        asPercent = p.getOrElse("percent", "false").toBoolean)),
    "doy_percentile_spell" -> ((df, freq, p) =>
      graft.indices.PercentileIndicators.doySpellDuration(df, Seq("location_id"), "time",
        p.getOrElse("var", "value"), p.getOrElse("per", "0.9").toDouble,
        p.getOrElse("op", ">"), p.getOrElse("half_window", "2").toInt,
        p.getOrElse("window", "6").toInt, freq)))

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

  // ---- built-in indicator catalogue (SURVEY §2.2 families) ----
  // Threshold constants follow the reference's canonical defaults, expressed
  // in canonical units (K, kg m-2 s-1, m/s, m). 1 mm/d = 1/86400 kg m-2 s-1.
  def registerBuiltins(): Unit = {
    val mmd = 1.0 / 86400.0
    def temp = Seq(VarReq("value", "[temperature]", "K"))
    def prec = Seq(VarReq("value", "[precipitation]", "kg m-2 s-1"))
    def wind = Seq(VarReq("value", "[speed]", "m/s"))
    def leng = Seq(VarReq("value", "[length]", "m"))

    def reducer(id: String, title: String, base: String, v: Seq[VarReq],
                units: String, cm: String): Unit =
      fromConfig(IndicatorSpec(id, title, units, cellMethods = cm, inputs = v), base, Map.empty)

    def count(id: String, title: String, v: Seq[VarReq], op: String, thresh: Double): Unit =
      fromConfig(IndicatorSpec(id, title, "d", inputs = v),
        "threshold_count", Map("op" -> op, "thresh" -> thresh.toString))

    def dd(id: String, title: String, op: String, thresh: Double): Unit =
      fromConfig(IndicatorSpec(id, title, "K d", inputs = temp),
        "cumulative_difference", Map("op" -> op, "thresh" -> thresh.toString))

    def spell(id: String, title: String, v: Seq[VarReq], op: String, thresh: Double,
              window: Int): Unit =
      fromConfig(IndicatorSpec(id, title, "d", inputs = v, missing = "skip"),
        "spell_length_max", Map("op" -> op, "thresh" -> thresh.toString,
          "window" -> window.toString))

    // _simple.py reducers
    reducer("tg_mean", "Mean daily mean temperature", "resample_mean", temp, "K", "time: mean")
    reducer("tg_max", "Maximum daily mean temperature", "resample_max", temp, "K", "time: maximum")
    reducer("tg_min", "Minimum daily mean temperature", "resample_min", temp, "K", "time: minimum")
    reducer("tn_max", "Maximum daily minimum temperature", "resample_max", temp, "K", "time: maximum")
    reducer("tn_mean", "Mean daily minimum temperature", "resample_mean", temp, "K", "time: mean")
    reducer("tn_min", "Minimum daily minimum temperature", "resample_min", temp, "K", "time: minimum")
    reducer("tx_max", "Maximum daily maximum temperature", "resample_max", temp, "K", "time: maximum")
    reducer("tx_mean", "Mean daily maximum temperature", "resample_mean", temp, "K", "time: mean")
    reducer("tx_min", "Minimum daily maximum temperature", "resample_min", temp, "K", "time: minimum")
    reducer("max_1day_precipitation_amount", "Max 1-day precipitation", "resample_max",
      prec, "kg m-2 s-1", "time: maximum")
    reducer("precip_accumulation", "Total precipitation", "resample_sum",
      prec, "kg m-2 s-1 d", "time: sum")
    reducer("snow_depth", "Mean snow depth", "resample_mean", leng, "m", "time: mean")
    reducer("sfcWind_mean", "Mean wind speed", "resample_mean", wind, "m/s", "time: mean")
    reducer("sfcWind_max", "Maximum wind speed", "resample_max", wind, "m/s", "time: maximum")

    // threshold counts (_simple / _threshold)
    count("hot_days", "Days with tasmax > 30 degC", temp, ">", 303.15)
    count("frost_days", "Days with tasmin < 0 degC", temp, "<", 273.15)
    count("ice_days", "Days with tasmax < 0 degC", temp, "<", 273.15)
    count("tropical_nights", "Days with tasmin > 20 degC", temp, ">", 293.15)
    count("tx_days_above", "Days with tasmax above 25 degC", temp, ">", 298.15)
    count("tx_days_below", "Days with tasmax below 17 degC", temp, "<", 290.15)
    count("tn_days_above", "Days with tasmin above 20 degC", temp, ">", 293.15)
    count("tn_days_below", "Days with tasmin below -10 degC", temp, "<", 263.15)
    count("tg_days_above", "Days with tas above 10 degC", temp, ">", 283.15)
    count("tg_days_below", "Days with tas below 10 degC", temp, "<", 283.15)
    count("wetdays", "Days with precip >= 1 mm/d", prec, ">=", mmd)
    count("dry_days", "Days with precip < 0.2 mm/d", prec, "<", 0.2 * mmd)
    count("calm_days", "Days with wind < 2 m/s", wind, "<", 2.0)
    count("windy_days", "Days with wind > 10.8 m/s", wind, ">", 10.8)
    count("snd_days_above", "Days with snow depth > 2 cm", leng, ">", 0.02)

    // degree days
    dd("growing_degree_days", "Growing degree days (> 4 degC)", ">", 277.15)
    dd("cooling_degree_days", "Cooling degree days (> 18 degC)", ">", 291.15)
    dd("heating_degree_days", "Heating degree days (< 17 degC)", "<", 290.15)
    dd("freezing_degree_days", "Freezing degree days (< 0 degC)", "<", 273.15)

    // spells
    spell("heat_wave_index", "Max heat spell length (tasmax > 25 degC, 5d)", temp, ">", 298.15, 5)
    spell("cold_spell_max_length", "Max cold spell (tas < -10 degC, 3d)", temp, "<", 263.15, 3)
    spell("maximum_consecutive_dry_days", "Max consecutive dry days", prec, "<", mmd, 1)
    spell("maximum_consecutive_wet_days", "Max consecutive wet days", prec, ">=", mmd, 1)
    spell("maximum_consecutive_frost_days", "Max consecutive frost days", temp, "<", 273.15, 1)

    // percentile-based (tx90p family, _multivariate.py:1300-1654; WSDI/CSDI
    // :69,:1719) — doy climatology pool +-2d (reference default 5-day window)
    def pctl(id: String, title: String, per: Double, op: String): Unit =
      fromConfig(IndicatorSpec(id, title, "d", inputs = temp, missing = "skip"),
        "doy_percentile_count", Map("per" -> per.toString, "op" -> op))
    pctl("tx90p", "Days with tasmax above the 90th doy percentile", 0.9, ">")
    pctl("tx10p", "Days with tasmax below the 10th doy percentile", 0.1, "<")
    pctl("tn90p", "Days with tasmin above the 90th doy percentile", 0.9, ">")
    pctl("tn10p", "Days with tasmin below the 10th doy percentile", 0.1, "<")
    pctl("tg90p", "Days with tas above the 90th doy percentile", 0.9, ">")
    pctl("tg10p", "Days with tas below the 10th doy percentile", 0.1, "<")
    fromConfig(IndicatorSpec("warm_spell_duration_index",
      "Days in spells of >= 6 days with tasmax above the 90th doy percentile",
      "d", inputs = temp, missing = "skip"),
      "doy_percentile_spell", Map("per" -> "0.9", "op" -> ">", "window" -> "6"))
    fromConfig(IndicatorSpec("cold_spell_duration_index",
      "Days in spells of >= 6 days with tasmin below the 10th doy percentile",
      "d", inputs = temp, missing = "skip"),
      "doy_percentile_spell", Map("per" -> "0.1", "op" -> "<", "window" -> "6"))

    // occurrences
    fromConfig(IndicatorSpec("first_day_temperature_above",
      "First day with tas above 5 degC", "1", inputs = temp, missing = "skip"),
      "first_occurrence", Map("op" -> ">", "thresh" -> "278.15"))
    fromConfig(IndicatorSpec("first_day_temperature_below",
      "First day with tas below 0 degC", "1", inputs = temp, missing = "skip"),
      "first_occurrence", Map("op" -> "<", "thresh" -> "273.15"))
  }
}
