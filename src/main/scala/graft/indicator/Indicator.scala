package graft.indicator

import graft.core.{Time, Units}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** The indicator layer — the engine's equivalent of
  * `xclim/core/indicator.py` (`Indicator.__call__` staging, indicator.py:865-944):
  * input validation (frequency datacheck, CF attr check), input unit
  * conversion to the compute function's canonical units, the compute plan,
  * output metadata stamping, and missing-period masking
  * (`CheckMissingIndicator._postprocess`, indicator.py:1522).
  *
  * Data model: the canonical long frame `(location_id LONG, time TIMESTAMP,
  * <var> DOUBLE ...)` with per-column `units` carried in StructField
  * metadata (SURVEY §1.2). All staging is driver-side plan construction —
  * zero extra executors work beyond the compute plan itself.
  */
final case class VarReq(
    name: String,            // canonical variable name (tas, pr, ...)
    dimensionality: String,  // "[temperature]", "[precipitation]", ...
    canonicalUnits: String)  // units the compute body expects

final case class IndicatorSpec(
    identifier: String,
    title: String,
    units: String,                    // output units (post to_agg_units)
    standardName: String = "",
    cellMethods: String = "",
    inputs: Seq[VarReq] = Seq(VarReq("value", "[]", "1")),
    srcFreq: String = "D",            // expected input sampling
    missing: String = "any",          // any | pct | at_least_n | skip
    missingOptions: Map[String, Double] = Map.empty)

final class IndicatorValidationException(msg: String) extends IllegalArgumentException(msg)

abstract class Indicator(val spec: IndicatorSpec) {

  /** The compute body: canonical-unit inputs -> resampled output frame with
    * columns (location_id, period, value). */
  protected def compute(df: DataFrame, freq: String, params: Map[String, String]): DataFrame

  /** Full indicator pipeline. `df` columns must include location_id, time
    * and each input var column (by canonical name). */
  def apply(df: DataFrame, freq: String, params: Map[String, String] = Map.empty): DataFrame = {
    datacheck(df)
    val converted = spec.inputs.foldLeft(df) { (acc, v) =>
      val unit = columnUnits(acc, v.name).getOrElse(v.canonicalUnits)
      if (!Units.checkDimension(unit, v.dimensionality))
        throw new IndicatorValidationException(
          s"${spec.identifier}: ${v.name} has units '$unit', expected ${v.dimensionality}")
      acc.withColumn(v.name, Units.convert(col(v.name), unit, v.canonicalUnits))
    }
    val out = compute(converted, freq, params)
    val masked = Missing.mask(spec, converted, out, freq)
    stampMetadata(masked, freq)
  }

  /** Frequency datacheck (`datachecks.check_freq`, datachecks.py:20):
    * sample the modal time step and compare against srcFreq. Driver-side on
    * a bounded sample — never a full scan. */
  private def datacheck(df: DataFrame): Unit = {
    if (spec.srcFreq.isEmpty || !df.columns.contains("time")) return
    val expected: Option[Long] = spec.srcFreq match {
      case "D" => Some(86400L)
      case "h" => Some(3600L)
      case _   => None
    }
    expected.foreach { secs =>
      val sample = df.select(col("location_id"), col("time")).limit(1000)
        .groupBy(col("location_id"))
        .agg(sort_array(collect_list(col("time"))).as("ts"))
        .select(explode(expr(
          "transform(slice(ts, 2, 999), (x, i) -> unix_timestamp(x) - unix_timestamp(ts[i]))")).as("step"))
        .groupBy(col("step")).count().orderBy(col("count").desc).limit(1)
        .collect()
      sample.headOption.foreach { r =>
        val modal = r.getLong(0)
        if (modal != secs)
          throw new IndicatorValidationException(
            s"${spec.identifier}: expected ${spec.srcFreq} sampling (${secs}s), got modal step ${modal}s")
      }
    }
  }

  private def columnUnits(df: DataFrame, name: String): Option[String] = {
    val f = df.schema.fields.find(_.name == name)
    f.flatMap(x => if (x.metadata.contains("units")) Some(x.metadata.getString("units")) else None)
  }

  /** Output CF metadata (AttrFormatter equivalent, formatting.py:42):
    * `{freq}` / `{identifier}` / parameter placeholders are substituted in
    * the title, and per-locale long_name variants are stamped for every
    * locale registered in [[Options]] (the reference's `locales` option +
    * `xclim.core.locales` translation path). */
  private def stampMetadata(df: DataFrame, freq: String): DataFrame = {
    val fmt = AttrFormatter.format(spec.title,
      Map("freq" -> freq, "identifier" -> spec.identifier))
    val b = new MetadataBuilder()
      .putString("units", spec.units)
      .putString("standard_name", spec.standardName)
      .putString("cell_methods", spec.cellMethods)
      .putString("long_name", s"$fmt ($freq)")
    Options.get.locales.foreach { loc =>
      AttrFormatter.translate(loc, spec.identifier).foreach(t =>
        b.putString(s"long_name_$loc", s"$t ($freq)"))
    }
    val md = b.build()
    if (df.columns.contains("value")) df.withColumn("value", col("value").as("value", md))
    else df
  }
}

/** `set_options` (xclim/core/options.py): process-wide knobs consulted by
  * the indicator pipeline. Scoped overrides via `Options.withOptions`. */
object Options {
  final case class Opts(
      checkMissing: String = "any",     // default missing policy when a spec says "default"
      dataValidation: String = "raise", // raise | warn | log on datacheck failure
      locales: Seq[String] = Nil)
  private val current = new java.util.concurrent.atomic.AtomicReference(Opts())
  def get: Opts = current.get()
  def set(o: Opts): Unit = current.set(o)
  def withOptions[T](o: Opts)(body: => T): T = {
    val prev = current.get()
    current.set(o)
    try body finally current.set(prev)
  }
}

/** Metadata templating + locale catalogue (formatting.py:42 AttrFormatter,
  * core/locales). The bundled catalogue carries the French long_names of
  * the most-used indicators (the reference ships fr.json); callers extend
  * via [[AttrFormatter.addLocale]]. */
object AttrFormatter {
  def format(template: String, params: Map[String, String]): String =
    params.foldLeft(template) { case (s, (k, v)) => s.replace(s"{$k}", v) }

  private val locales =
    scala.collection.concurrent.TrieMap[(String, String), String](
      ("fr", "tg_mean") -> "Moyenne de la température moyenne quotidienne",
      ("fr", "tx_max") -> "Maximum de la température maximale quotidienne",
      ("fr", "tn_min") -> "Minimum de la température minimale quotidienne",
      ("fr", "tx_mean") -> "Moyenne de la température maximale quotidienne",
      ("fr", "tn_mean") -> "Moyenne de la température minimale quotidienne",
      ("fr", "tg_max") -> "Maximum de la température moyenne quotidienne",
      ("fr", "tg_min") -> "Minimum de la température moyenne quotidienne",
      ("fr", "frost_days") -> "Nombre de jours de gel",
      ("fr", "ice_days") -> "Nombre de jours où la température maximale quotidienne est sous {thresh}",
      ("fr", "hot_days") -> "Nombre de jours où la température maximale quotidienne est au-dessus de {thresh}",
      ("fr", "calm_days") -> "Nombre de jours où la vitesse du vent de surface est sous {thresh}",
      ("fr", "windy_days") -> "Nombre de jours où la vitesse du vent de surface est au-dessus ou égale à {thresh}",
      ("fr", "growing_degree_days") -> "Degrés-jours de croissance",
      ("fr", "wetdays") -> "Nombre de jours pluvieux",
      ("fr", "wetdays_prop") -> "Proportion de jours où la précipitation est supérieure ou égale à {thresh}",
      ("fr", "dry_days") -> "Nombre de jours secs",
      ("fr", "sdii") -> "Indice simple de l'intensité des précipitations",
      ("fr", "daily_pr_intensity") -> "Moyenne de la précipitation quotidienne pour les jours pluvieux",
      ("fr", "prcptot") -> "Précipitation totale",
      ("fr", "max_1day_precipitation_amount") -> "Précipitation quotidienne maximale",
      ("fr", "max_n_day_precipitation_amount") -> "Maximum du cumul sur {window} jours de la précipitation quotidienne",
      ("fr", "maximum_consecutive_dry_days") -> "Durée maximale d'une période sèche",
      ("fr", "maximum_consecutive_wet_days") -> "Durée maximale d'une période où les précipitations sont au-dessus de {thresh}",
      ("fr", "tropical_nights") -> "Nombre de nuits tropicales",
      ("fr", "heat_wave_index") -> "Indice de vague de chaleur",
      ("fr", "precip_accumulation") -> "Précipitations totales accumulées",
      ("fr", "snow_depth") -> "Épaisseur de neige",
      ("fr", "growing_season_length") -> "Durée de la saison de croissance",
      ("fr", "cold_spell_total_length") -> "Durée totale des périodes de froid d'au moins {window} jours consécutifs",
      ("fr", "cold_spell_max_length") -> "Série la plus longue d'au moins {window} jours consécutifs sous {thresh}",
      ("fr", "daily_temperature_range") -> "Amplitude diurne de la température",
      ("fr", "etr") -> "Amplitude des températures extrêmes",
      ("fr", "tx_days_above") -> "Nombre de jours ayant une température maximale quotidienne au-dessus de {thresh}",
      ("fr", "tn_days_below") -> "Nombre de jours ayant une température minimale quotidienne sous {thresh}",
      ("fr", "last_spring_frost") -> "Dernier jour de gel printanier",
      ("fr", "first_snowfall") -> "Date du premier jour où la chute de neige est au-dessus de {thresh}",
      ("fr", "last_snowfall") -> "Date du dernier jour où la chute de neige est au-dessus de {thresh}",
      ("fr", "snowfall_frequency") -> "Pourcentage de jours où la chute de neige est au-dessus de {thresh}",
      ("fr", "snowfall_intensity") -> "Chute de neige moyenne au-dessus de {thresh}",
      // second locale: proves the (locale, identifier) table and the
      // stamping path are locale-general, not fr-shaped
      ("de", "tg_mean") -> "Mittel der täglichen Mitteltemperatur",
      ("de", "tx_max") -> "Maximum der täglichen Höchsttemperatur",
      ("de", "tn_min") -> "Minimum der täglichen Tiefsttemperatur",
      ("de", "frost_days") -> "Anzahl der Frosttage",
      ("de", "ice_days") -> "Anzahl der Eistage",
      ("de", "tropical_nights") -> "Anzahl der Tropennächte",
      ("de", "dry_days") -> "Anzahl der Trockentage",
      ("de", "wetdays") -> "Anzahl der Niederschlagstage",
      ("de", "precip_accumulation") -> "Aufsummierter Gesamtniederschlag",
      ("de", "growing_degree_days") -> "Wachstumsgradtage",
      ("de", "heat_wave_index") -> "Hitzewellenindex",
      ("de", "maximum_consecutive_dry_days") -> "Maximale Anzahl aufeinanderfolgender Trockentage",
      ("de", "snow_depth") -> "Schneehöhe")

  def translate(locale: String, identifier: String): Option[String] =
    locales.get((locale, identifier))
  def addLocale(locale: String, identifier: String, longName: String): Unit =
    locales.put((locale, identifier), longName)
}

/** Missing-period policies (`xclim/core/missing.py`): a period's output is
  * nulled when its input coverage fails the policy. Computed as one extra
  * aggregate over the same (location, period) grouping and joined back —
  * Catalyst shares the shuffle with the compute plan. */
object Missing {
  def mask(spec: IndicatorSpec, input: DataFrame, out: DataFrame, freq: String): DataFrame = {
    if (spec.missing == "skip" || !out.columns.contains("value") ||
      !input.columns.contains("time")) return out
    if (spec.missing == "wmo") return maskWmo(spec, input, out, freq)
    val counts = input
      .groupBy(col("location_id"), Time.resamplePeriod(col("time"), freq).as("period"))
      .agg(count(col(spec.inputs.head.name)).as("_valid"))
      .withColumn("_expected", Time.expectedDays(col("period"), freq))
    val bad: Column = spec.missing match {
      case "any"        => col("_valid") < col("_expected")
      case "pct"        =>
        val tol = spec.missingOptions.getOrElse("tolerance", 0.1)
        (col("_expected") - col("_valid")).cast("double") / col("_expected") > tol
      case "at_least_n" =>
        val n = spec.missingOptions.getOrElse("n", 20.0)
        col("_valid") < n
      case "some_but_not_all" =>
        !(col("_valid") === col("_expected") || col("_valid") === 0)
      case other        => throw new IllegalArgumentException(s"bad missing policy: $other")
    }
    out.join(counts, Seq("location_id", "period"), "left")
      .withColumn("value", when(coalesce(bad, lit(true)), lit(null)).otherwise(col("value")))
      .drop("_valid", "_expected")
  }

  /** Missing diagnostics WITH a select_time indexer (missing.py:117-150):
    * per (keys, period): `n_expected` calendar days matching the indexer
    * (leap years and wrap-around windows handled by the generated
    * day-sequence count), `n_valid` non-null observations on matching
    * days, `n_missing`, and the `missing_any` policy verdict. Periods with
    * NO matching observations at all do not appear (join the caller's
    * period axis to surface them as fully-missing). */
  def missingIndexed(input: DataFrame, keys: Seq[String], time: Column,
                     value: Column, freq: String,
                     pred: Column => Column): DataFrame = {
    input.filter(pred(time.cast("date")))
      .groupBy(keys.map(col) :+ Time.resamplePeriod(time, freq).as("period"): _*)
      .agg(count(value).as("n_valid"))
      .withColumn("n_expected", Time.expectedDaysSelected(col("period"), freq, pred))
      .withColumn("n_missing", col("n_expected") - col("n_valid"))
      .withColumn("missing_any", col("n_missing") > 0)
  }

  /** Per-(keys, month) WMO missing diagnostics (missing.py:395): a month is
    * bad when >= nm days are missing in total or >= nc CONSECUTIVE days
    * are. Consecutive absences come from present-row date gaps (lag +
    * leading/trailing month edges) — no densify, one window pass + one
    * hash-agg. Rows with null `value` count as missing. Output columns:
    * keys..., `month` (date), `n_valid`, `n_missing`, `max_miss_run`,
    * `bad`. Exposed standalone (and oracle-checked by `q_missing_wmo`);
    * [[mask]]'s "wmo" policy builds its period collapse on top. */
  def wmoMonthlyFlags(input: DataFrame, keys: Seq[String], time: Column,
                      value: Column, nm: Double = 11, nc: Double = 5): DataFrame = {
    val d = time.cast("date")
    val valid = input.filter(value.isNotNull)
      .withColumn("_m", date_trunc("MONTH", time))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col) :+ col("_m"): _*).orderBy(d)
    valid
      .withColumn("_gap", datediff(d, lag(d, 1).over(w)) - 1)
      .groupBy(keys.map(col) :+ col("_m"): _*)
      .agg(count(lit(1)).as("n_valid"), max(col("_gap")).as("_midgap"),
        min(d).as("_first"), max(d).as("_last"))
      .withColumn("_dim", dayofmonth(last_day(col("_first"))))
      .withColumn("max_miss_run", greatest(
        coalesce(col("_midgap"), lit(0)),
        dayofmonth(col("_first")) - 1,
        col("_dim") - dayofmonth(col("_last"))))
      .withColumn("n_missing", col("_dim") - col("n_valid"))
      .withColumn("bad", col("n_missing") >= nm || col("max_miss_run") >= nc)
      .withColumn("month", col("_m").cast("date"))
      .select(keys.map(col) ++ Seq(col("month"), col("n_valid"),
        col("n_missing"), col("max_miss_run"), col("bad")): _*)
  }

  /** MissingWMO masking: monthly flags from [[wmoMonthlyFlags]], collapsed
    * to the target period with the MissingTwoSteps "any" rule. */
  private def maskWmo(spec: IndicatorSpec, input: DataFrame, out: DataFrame,
                      freq: String): DataFrame = {
    val nm = spec.missingOptions.getOrElse("nm", 11.0)
    val nc = spec.missingOptions.getOrElse("nc", 5.0)
    val monthly = wmoMonthlyFlags(input, Seq("location_id"), col("time"),
      col(spec.inputs.head.name), nm, nc)
    val byPeriod = monthly
      .groupBy(col("location_id"),
        Time.resamplePeriod(col("month"), freq).as("period"))
      .agg(max(col("bad")).as("_bad"))
    out.join(byPeriod, Seq("location_id", "period"), "left")
      .withColumn("value", when(coalesce(col("_bad"), lit(true)), lit(null))
        .otherwise(col("value")))
      .drop("_bad")
  }
}
