package graft

import graft.indicator.{IndicatorSpec, Registry, VarReq, VirtualModules}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import org.scalatest.funsuite.AnyFunSuite

/** Indicator pipeline behavior tests (the reference's test_indicators.py
  * pattern: metadata, unit conversion, missing masking, virtual modules). */
class IndicatorSpecSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  Registry.registerBuiltins()

  /** Full July 2000 of daily tas in degC, one location; value = 20 + doy%5. */
  private def julyTas = {
    import spark.implicits._
    val md = new MetadataBuilder().putString("units", "degC").build()
    (1 to 31).map { d =>
      (0L, java.sql.Timestamp.valueOf(f"2000-07-$d%02d 00:00:00"), 20.0 + d % 5)
    }.toDF("location_id", "time", "value")
      .withColumn("value", col("value").as("value", md))
  }

  test("tg_mean converts degC input to K and stamps metadata") {
    val out = Registry("tg_mean")(julyTas, "MS")
    val row = out.head
    // mean of 20 + (1..31 % 5) in K
    val expected = (1 to 31).map(d => 20.0 + d % 5).sum / 31 + 273.15
    assert(math.abs(row.getAs[Double]("value") - expected) < 1e-9)
    val md = out.schema.fields.find(_.name == "value").get.metadata
    assert(md.getString("units") == "K")
    assert(md.getString("cell_methods") == "time: mean")
  }

  test("missing=any masks incomplete periods") {
    val missingDay = julyTas.filter(dayofmonth(col("time")) =!= 15)
    val out = Registry("tg_mean")(missingDay, "MS")
    assert(out.head.isNullAt(out.columns.indexOf("value")))
    // complete input is not masked
    assert(!Registry("tg_mean")(julyTas, "MS").head.isNullAt(2))
  }

  test("missing=wmo masks on 11 total or 5 consecutive missing days") {
    import graft.indicator.{Indicator, IndicatorSpec, Missing}
    val spec = IndicatorSpec("wmo_mean", "t", "K",
      inputs = Seq(VarReq("value", "[temperature]", "K")),
      missing = "wmo")
    val ind = new Indicator(spec) {
      protected def compute(df: org.apache.spark.sql.DataFrame, freq: String,
                            params: Map[String, String]): org.apache.spark.sql.DataFrame =
        graft.indices.Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
          Seq(avg(col("value")).as("value")))
    }
    def vIdx(df: org.apache.spark.sql.DataFrame) = df.columns.indexOf("value")
    // 4 scattered missing days (< 11 total, < 5 consecutive): keep
    val scattered = julyTas.filter(!dayofmonth(col("time")).isin(2, 9, 16, 23))
    val keep = ind(scattered, "MS")
    assert(!keep.head.isNullAt(vIdx(keep)))
    // 5 consecutive missing days: mask
    val consec = julyTas.filter(!dayofmonth(col("time")).between(10, 14))
    val gone = ind(consec, "MS")
    assert(gone.head.isNullAt(vIdx(gone)))
    // 11 missing days in runs of <= 2 (total criterion, not consecutive;
    // days 17-31 stay contiguous so daily sampling remains modal): mask
    val eleven = julyTas.filter(!dayofmonth(col("time"))
      .isin(1, 2, 4, 5, 7, 8, 10, 11, 13, 14, 16))
    assert(eleven.count() == 20)
    val gone2 = ind(eleven, "MS")
    assert(gone2.head.isNullAt(vIdx(gone2)))
  }

  test("missing=some_but_not_all keeps complete and fully-empty periods") {
    import graft.indicator.{Indicator, IndicatorSpec}
    val spec = IndicatorSpec("sbna_mean", "t", "K",
      inputs = Seq(VarReq("value", "[temperature]", "K")),
      missing = "some_but_not_all")
    val ind = new Indicator(spec) {
      protected def compute(df: org.apache.spark.sql.DataFrame, freq: String,
                            params: Map[String, String]): org.apache.spark.sql.DataFrame =
        graft.indices.Generic.resampleOp(df, Seq("location_id"), col("time"), freq,
          Seq(avg(col("value")).as("value")))
    }
    val full = ind(julyTas, "MS")
    assert(!full.head.isNullAt(full.columns.indexOf("value")))
    val partial = ind(julyTas.filter(dayofmonth(col("time")) =!= 15), "MS")
    assert(partial.head.isNullAt(partial.columns.indexOf("value")))
  }

  test("dimensionality validation rejects wrong units") {
    val md = new MetadataBuilder().putString("units", "mm/d").build()
    val bad = julyTas.withColumn("value", col("value").as("value", md))
    assertThrows[graft.indicator.IndicatorValidationException] {
      Registry("tg_mean")(bad, "MS")
    }
  }

  test("threshold indicator counts days (unit-converted threshold)") {
    // tx_days_above: > 298.15 K == 25 degC; July values 20..24 -> 0 days,
    // so shift +3: values 23/24 cross at d%5 in {3,4} -> none >25; use 22+
    val out = Registry("tx_days_above")(julyTas, "MS")
    assert(out.head.getAs[Long]("value") == 0L)
  }

  test("YAML virtual module registers and runs") {
    val yaml =
      """module: icclim
        |indicators:
        |  SU:
        |    base: threshold_count
        |    title: Summer days
        |    units: d
        |    parameters: { op: ">", thresh: "295.15" }
        |    input: { var: tas, dimensionality: "[temperature]", units: K }
        |    missing: skip
        |  GD4:
        |    base: cumulative_difference
        |    title: Growing degree days over 4 degC
        |    units: "K d"
        |    parameters: { op: ">", thresh: "277.15" }
        |    input: { var: tas, dimensionality: "[temperature]", units: K }
        |    missing: skip
        |""".stripMargin
    val ids = VirtualModules.loadYaml(yaml)
    assert(ids.toSet == Set("icclim.SU", "icclim.GD4"))
    // SU: days with tas > 22 degC: d%5 in {3,4} -> 12 days in July (d=3,4,8,9,...)
    val su = Registry("icclim.SU")(julyTas, "MS").head.getAs[Long]("value")
    assert(su == (1 to 31).count(d => 20.0 + d % 5 > 22.0))
    val gd4 = Registry("icclim.GD4")(julyTas, "MS").head.getAs[Double]("value")
    val expected = (1 to 31).map(d => (20.0 + d % 5) - 4.0).sum
    assert(math.abs(gd4 - expected) < 1e-9)
  }

  test("bundled icclim catalogue loads and runs") {
    import spark.implicits._
    import org.apache.spark.sql.types.MetadataBuilder
    val ids = VirtualModules.loadBundled("icclim")
    assert(VirtualModules.loadBundled("anuclim").size >= 19)
    assert(VirtualModules.loadBundled("cf").size >= 54)
    assert(ids.size >= 55, s"icclim catalogue has ${ids.size} entries")
    assert(Registry.names.size >= 240, s"registry has ${Registry.names.size} names")
    // a quarter-selection bioclim runs end to end: wettest-quarter mean temp
    import spark.implicits._
    val md = new MetadataBuilder().putString("units", "degC").build()
    val twoVar = (0 until 365).map { i =>
      val m = i / 31 + 1
      (0L, java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2001-01-01")
        .plusDays(i).atStartOfDay), 10.0 + m, if (m == 6 || m == 7 || m == 8) 9.0 else 1.0)
    }.toDF("location_id", "time", "value", "value2")
      .withColumn("value", col("value").as("value", md))
    val p8 = Registry("anuclim.P8_MeanTempWettestQuarter")(twoVar, "YS", Map.empty)
    val v = p8.head.getAs[Double]("value")
    // wettest 3-month window sits in Jun-Aug (values 16..18 degC -> K)
    assert(v > 273.15 + 15.5 && v < 273.15 + 18.5, s"P8 = $v")
    assert(ids.contains("icclim.CDD") && ids.contains("icclim.TXx"))
    val mdPr = new MetadataBuilder().putString("units", "mm/d").build()
    val pr = (0 until 31).map { i =>
      (0L, java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2000-07-01")
        .plusDays(i).atStartOfDay), if (i % 5 == 4) 5.0 else 0.0)
    }.toDF("location_id", "time", "value")
      .withColumn("value", col("value").as("value", mdPr))
    assert(Registry("icclim.CDD")(pr, "MS", Map.empty).head.getAs[Long]("value") == 4)
    assert(Registry("icclim.RR1")(pr, "MS", Map.empty).head.getAs[Long]("value") == 6)
  }

  test("set_options locales stamp translated long_names") {
    import graft.indicator.{AttrFormatter, Options}
    assert(AttrFormatter.format("Days over {thresh} per {freq}",
      Map("thresh" -> "25 degC", "freq" -> "YS")) == "Days over 25 degC per YS")
    Options.withOptions(Options.Opts(locales = Seq("fr"))) {
      val out = Registry("tg_mean")(julyTas, "MS")
      val md = out.schema.fields.find(_.name == "value").get.metadata
      assert(md.getString("long_name_fr").startsWith("Moyenne de la température"))
    }
    // outside the scope, no locale stamping
    val out2 = Registry("tg_mean")(julyTas, "MS")
    val md2 = out2.schema.fields.find(_.name == "value").get.metadata
    assert(!md2.contains("long_name_fr"))
  }

  test("multiple locales stamp side by side; catalogue covers later additions") {
    import graft.indicator.{AttrFormatter, Options}
    Options.withOptions(Options.Opts(locales = Seq("fr", "de"))) {
      val out = Registry("tg_mean")(julyTas, "MS")
      val md = out.schema.fields.find(_.name == "value").get.metadata
      assert(md.getString("long_name_fr").startsWith("Moyenne de la température"))
      assert(md.getString("long_name_de") == "Mittel der täglichen Mitteltemperatur (MS)")
    }
    // r2/r3 registry additions have fr entries too (not just the round-1 ten)
    for (id <- Seq("cold_spell_total_length", "snowfall_frequency", "etr",
        "daily_temperature_range", "prcptot", "last_spring_frost"))
      assert(AttrFormatter.translate("fr", id).nonEmpty, id)
    // unknown locale/identifier degrade to no stamp, not an error
    assert(AttrFormatter.translate("de", "nonexistent_indicator").isEmpty)
  }

  test("registry listing includes builtins") {
    assert(Seq("tg_mean", "tx_max", "tn_min", "growing_degree_days", "wetdays",
      "maximum_consecutive_dry_days", "frost_days", "cooling_degree_days",
      "first_day_temperature_above").forall(Registry.names.contains))
    assert(Registry.names.size >= 40)
  }

  test("catalogue spot-checks: frost_days, degree days, consecutive dry days") {
    import spark.implicits._
    import org.apache.spark.sql.types.MetadataBuilder
    val md = new MetadataBuilder().putString("units", "degC").build()
    // full July (missing=any would mask a partial month): every 3rd day -2,
    // the rest 5 degC -> 11 frost days, gdd = 20 days x 1 K
    val df = (0 until 31).map { i =>
      (0L, java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2000-07-01")
        .plusDays(i).atStartOfDay), if (i % 3 == 0) -2.0 else 5.0)
    }.toDF("location_id", "time", "value")
      .withColumn("value", col("value").as("value", md))
    val frost = Registry("frost_days")(df, "MS", Map.empty).head.getAs[Long]("value")
    assert(frost == 11)
    val gdd = Registry("growing_degree_days")(df, "MS", Map.empty).head.getAs[Double]("value")
    assert(math.abs(gdd - 20.0) < 1e-9)
    // precip: rain every 5th day -> longest dry run 4
    val mdPr = new MetadataBuilder().putString("units", "mm/d").build()
    val pr = (0 until 31).map { i =>
      (0L, java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2000-07-01")
        .plusDays(i).atStartOfDay), if (i % 5 == 4) 5.0 else 0.0)
    }.toDF("location_id", "time", "value")
      .withColumn("value", col("value").as("value", mdPr))
    val cdd = Registry("maximum_consecutive_dry_days")(pr, "MS", Map.empty)
      .head.getAs[Long]("value")
    assert(cdd == 4)
  }

  test("every registered indicator RUNS on a canonical two-variable year") {
    // the reference's test_modules.py twin: all builtins + all three
    // bundled virtual catalogues must not only instantiate but execute,
    // producing a non-empty frame with a value column
    import spark.implicits._
    VirtualModules.loadBundled("icclim")
    VirtualModules.loadBundled("anuclim")
    VirtualModules.loadBundled("cf")
    assert(Registry.names.size >= 270, s"registry has ${Registry.names.size}")
    // one synthetic year; each indicator gets its declared input columns
    // stamped with their CANONICAL units (temperatures span freeze/thaw,
    // everything else gets a positive seasonal signal)
    val base = (0 until 366).map { i =>
      val t = 273.15 + 15.0 * math.sin((i - 30) / 58.0)
      val p = math.max(0.0, 12.0 * math.sin(i / 23.0))
      (0L, java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2000-01-01")
        .plusDays(i).atStartOfDay), t, p)
    }.toDF("location_id", "time", "_t", "_p").cache()
    def frameFor(spec: graft.indicator.IndicatorSpec) = {
      spec.inputs.foldLeft(base) { (df, vr) =>
        val md = new MetadataBuilder().putString("units", vr.canonicalUnits).build()
        val src = if (vr.dimensionality == "[temperature]") col("_t")
          else if (vr.name == "valuemin") col("_t") - 12.0
          else if (vr.name == "valuemax") col("_t") + 5.0
          else col("_p")
        val stamped = if (vr.dimensionality == "[temperature]" && vr.name != "value")
          (if (vr.name == "value2") col("_t") - 8.0 else src) else src
        df.withColumn(vr.name, stamped.as(vr.name, md))
      }
    }
    val failures = Registry.names.flatMap { n =>
      try {
        val ind = Registry(n)
        val out = ind(frameFor(ind.spec), "YS", Map.empty)
        if (out.columns.contains("value") && out.limit(1).count() >= 0) None
        else Some(s"$n: no value column (${out.columns.mkString(",")})")
      } catch { case e: Throwable => Some(s"$n: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"${failures.size} indicators failed:\n${failures.take(12).mkString("\n")}")
  }

  test("round-3 catalogue registrations resolve and compute") {
    import spark.implicits._
    for (name <- Seq("cold_spell_total_length", "dry_spell_max_length",
        "maximum_consecutive_tx_days", "hot_spell_max_magnitude",
        "multiday_temperature_swing", "cooling_degree_days_approximation",
        "heating_degree_days_approximation", "holiday_snow_days",
        "holiday_snow_and_snowfall_days", "first_day_threshold_reached",
        "prcptot_wettest_period", "prcptot_driest_period",
        // canonical reference names over existing bases
        "maximum_consecutive_frost_free_days", "daily_pr_intensity",
        "days_over_precip_thresh", "fraction_over_precip_thresh",
        "daily_temperature_range", "daily_temperature_range_variability",
        "extreme_temperature_range", "temperature_seasonality",
        "precip_seasonality", "tg_mean_wetdry_quarter",
        "tg_mean_warmcold_quarter", "prcptot_wetdry_quarter",
        "prcptot_warmcold_quarter"))
      Registry(name) // resolves or throws
    // hot_spell_max_magnitude: 3 days at 28/29/30 degC over the 25 degC
    // threshold (excess 3+4+5 = 12 K d), window 3 (_threshold.py:2019)
    val md = new MetadataBuilder().putString("units", "degC").build()
    val df = (0 until 31).map { i =>
      (0L, java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2000-07-01")
        .plusDays(i).atStartOfDay),
        if (i >= 10 && i <= 12) 28.0 + (i - 10) else 20.0)
    }.toDF("location_id", "time", "value")
      .withColumn("value", col("value").as("value", md))
    val mag = Registry("hot_spell_max_magnitude")(df, "MS", Map.empty)
      .head.getAs[Double]("value")
    assert(math.abs(mag - 12.0) < 1e-9)
  }

  test("chill portions Dynamic Model: accumulates in chill range only") {
    import spark.implicits._
    def series(tasK: Double) =
      (0 until 1000).map(i => (0L, i, tasK)).toDF("key", "t", "v")
    def lastTotal(tasK: Double): Double =
      graft.indices.Agro.chillPortionsDynamic(series(tasK))
        .agg(max(col("chill_portions"))).head.getDouble(0)
    // 6 degC (279 K) is prime chill weather -> portions accumulate
    assert(lastTotal(279.0) > 5.0)
    // 27 degC (300 K): intermediate pool equilibrates below 1 -> none
    assert(lastTotal(300.0) == 0.0)
    // monotone running total
    val run = graft.indices.Agro.chillPortionsDynamic(series(279.0))
      .orderBy(col("t")).select(col("chill_portions")).as[Double].collect()
    assert(run.sliding(2).forall(p => p(1) >= p(0) - 1e-12))
  }

  test("ecadCompliant auto-battery: flags selected by present variables") {
    import spark.implicits._
    import graft.indicator.DataFlags
    // 40 clean days, then planted violations: tasmax < tasmin on day 3,
    // pr negative on day 5, hurs 120% on day 7 — entity 1 stays clean
    val rows = for (loc <- Seq(0L, 1L); i <- 0 until 40) yield {
      val bad = loc == 0L
      (loc, java.sql.Timestamp.from(java.time.Instant.parse(
        f"2020-${1 + i / 28}%02d-${1 + i % 28}%02d" + "T00:00:00Z")),
        10.0 + (i % 7), 15.0 + (i % 7),
        if (bad && i == 3) 20.0 else 5.0 + (i % 7), // tasmin above tasmax on day 3
        if (bad && i == 5) -2.0 else 1.0 + (i % 9), // negative pr on day 5
        if (bad && i == 7) 120.0 else 55.0)         // 120% humidity on day 7
    }
    val df = rows.toDF("location_id", "time", "tas", "tasmax", "tasmin", "pr", "hurs")
    val out = DataFlags.ecadCompliant(df).collect().map(r =>
      r.getAs[Long]("location_id") -> r).toMap
    // variable-driven selection: temperature triplet + pr + hurs checks,
    // no wind/discharge columns -> no wind/discharge flags
    assert(out(0L).schema.fieldNames.exists(_.startsWith("n_tasmax_below")))
    assert(!out(0L).schema.fieldNames.exists(_.contains("wind")))
    assert(out(0L).getAs[Long]("n_tasmax_below_tasmin") == 1L)
    assert(out(0L).getAs[Long]("n_negative_accumulation_values") == 1L)
    assert(out(0L).getAs[Long]("n_percentage_values_outside_of_bounds") == 1L)
    assert(!out(0L).getAs[Boolean]("ecad_qc_flag"))
    assert(out(1L).getAs[Boolean]("ecad_qc_flag"))
  }
}
