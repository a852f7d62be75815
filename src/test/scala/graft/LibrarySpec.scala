package graft

import graft.core.{Bootstrap, Calendars}
import graft.ensembles.Reduce
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Calendars, bootstrap plan builder, ensemble reduction. */
class LibrarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("360_day calendar month math") {
    import spark.implicits._
    val df = Seq((2000, 1), (2000, 30), (2000, 31), (2000, 360)).toDF("year", "doy")
    val got = df.select(Calendars.monthFromDoy(Calendars.Day360, col("doy"), col("year")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 1, 2, 12))
  }

  test("noleap month cuts and doy conversion") {
    import spark.implicits._
    val df = Seq((2001, 59), (2001, 60), (2001, 365)).toDF("year", "doy")
    val months = df.select(Calendars.monthFromDoy(Calendars.NoLeap, col("doy"), col("year")))
      .collect().map(_.getInt(0)).toSeq
    assert(months == Seq(2, 3, 12)) // feb 28 cut: doy 59 = Feb 28, doy 60 = Mar 1
    // 365 -> 360 day rescale: doy 365 -> 360
    val conv = df.select(Calendars.convertDoy(col("doy"), col("year"),
      Calendars.NoLeap, Calendars.Day360)).collect().map(_.getInt(0)).toSeq
    assert(conv.last == 360)
    assert(conv.head == 58) // 59/365 -> ~58/360
  }

  test("dai phase fractions: closed-form pins and clip rescale") {
    import spark.implicits._
    import graft.indices.Converters
    def f(a: Double, b: Double, c: Double, d: Double)(t: Double) =
      a * (math.tanh(b * (t - c)) - d) / 100.0
    val df = Seq((-10.0, 1), (1.1662, 7), (15.0, 12)).toDF("tas", "m")
    val got = df.select(
      Converters.snowfallFractionDai(col("tas"), "dai_annual"),
      Converters.snowfallFractionDai(col("tas"), "dai_seasonal", monthCol = col("m")),
      Converters.rainFractionDai(col("tas"), "dai_annual"),
      Converters.snowfallFractionDai(col("tas"), "dai_annual", clipTempC = Some(2.0)))
      .collect()
    // annual land snow at tas = c: tanh(0) = 0 -> f = -a*d/100
    assert(math.abs(got(1).getDouble(0) - (48.2292 * 1.0223 / 100.0)) < 1e-12)
    // the tanh asymptotes do NOT reach 0/1 (d > 1): the warm-end snow
    // fraction keeps the a·(1−d)/100 "sleet" residual — pin exact values
    val fAnn = f(-48.2292, 0.7205, 1.1662, 1.0223) _
    assert(got(0).getDouble(0) == math.min(1.0, fAnn(-10.0)))
    assert(math.abs(got(2).getDouble(0) - fAnn(15.0)) < 1e-12 && got(2).getDouble(0) > 0.0)
    // seasonal at m=7 (JJA land): distinct coefficient row
    assert(math.abs(got(1).getDouble(1) - f(-46.4000, 0.7013, 0.8362, 1.0217)(1.1662)) < 1e-12)
    // rain fraction mirrors: small cold residual, large-but-sub-1 warm value
    val fRain = f(-47.8337, -0.6866, 1.4913, 1.0420) _
    assert(math.abs(got(0).getDouble(2) - fRain(-10.0)) < 1e-12 && got(0).getDouble(2) < 0.05)
    assert(math.abs(got(2).getDouble(2) - fRain(15.0)) < 1e-12 && got(2).getDouble(2) > 0.9)
    // clip rescale hits exactly 0 at +Tc and 1 at -Tc
    val clip2 = Seq((2.0, 1), (-2.0, 1)).toDF("tas", "m").select(
      Converters.snowfallFractionDai(col("tas"), "dai_annual", clipTempC = Some(2.0)))
      .collect().map(_.getDouble(0)).toSeq
    assert(clip2 == Seq(0.0, 1.0))
  }

  test("bohren98 relative humidity: saturation at Td = T, clip at 100") {
    import spark.implicits._
    import graft.indices.Converters
    val df = Seq((280.0, 280.0), (280.0, 270.0), (280.0, 290.0)).toDF("t", "td")
    val got = df.select(Converters.relativeHumidityBohren98(col("t"), col("td")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got(0) == 100.0) // Td = T -> exp(0)
    val expect = 100.0 * math.exp(-2.501e6 * 10.0 / (461.5 * 280.0 * 270.0))
    assert(math.abs(got(1) - expect) < 1e-9 && got(1) < 100.0)
    assert(got(2) == 100.0) // supersaturated input clips
  }

  test("bootstrap replicas: year replacement bookkeeping") {
    import spark.implicits._
    // 3 base years, 2 rows each
    val df = (for (y <- 2000 to 2002; i <- 1 to 2) yield (y, i)).toDF("year", "i")
    val reps = Bootstrap.replicas(df, col("year"), Seq(2000, 2001, 2002))
    // 6 replicas; each keeps 3 years' worth of rows (one replaced)
    val counts = reps.groupBy("bootstrap_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.size == 6)
    assert(counts.values.forall(_ == 6L)) // 3 years x 2 rows
    // in replica "2000<-2001", year 2000 absent and 2001 doubled
    val r01 = reps.filter(col("bootstrap_id") === "2000<-2001")
      .groupBy("year").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(r01 == Map(2001 -> 4L, 2002 -> 2L))
    // averaging collapses the replica dim
    val idx = reps.groupBy(col("bootstrap_id")).agg(avg(col("i")).as("v"))
    val out = Bootstrap.average(idx, "v")
    assert(out.count() == 1 && out.head.getAs[Long]("n_replicas") == 6L)
  }

  test("two-state recursion: threshold conversion accumulates units") {
    import spark.implicits._
    // key 0: steady input 0.6/step, cap 1.0, no decay -> a unit every 2 steps
    val df = (1 to 10).map(t => (0L, t, 0.6)).toDF("key", "t", "v")
    val out = graft.plans.Recursive.thresholdConversion(df, gain = 1.0,
        decay = 1.0, cap = 1.0)
      .orderBy("t").collect().map(_.getDouble(2)).toSeq
    // pool: .6 1.2->unit(.2) .8 1.4->unit(.4) 1.0->unit ... totals:
    assert(out.last == 6.0 - 1.0) // 10*0.6 = 6.0 accumulated, pool holds <1
    assert(out == out.sorted)     // monotone non-decreasing totals
  }

  test("ensemble filters: concat_hist, model_in_all_scens, single_member") {
    import spark.implicits._
    import graft.ensembles.Ensembles
    // (model, scenario, member, t, v)
    val df = Seq(
      ("m1", "historical", "r1", 0, 1.0), ("m1", "ssp245", "r1", 1, 2.0),
      ("m1", "ssp370", "r1", 1, 3.0), ("m1", "ssp370", "r2", 1, 4.0),
      ("m2", "historical", "r1", 0, 5.0), ("m2", "ssp245", "r1", 1, 6.0)
    ).toDF("model", "scenario", "member", "t", "v")
    // concat_hist: hist rows replicate under each future scenario
    val ch = Ensembles.concatHist(df, "scenario", "historical")
    assert(ch.filter($"scenario" === "historical").count() == 0)
    assert(ch.filter($"model" === "m1" && $"scenario" === "ssp245").count() == 2) // hist + future
    assert(ch.filter($"model" === "m2" && $"scenario" === "ssp370").count() == 1) // m2 hist replicated
    // model_in_all_scens: m2 misses ssp370 -> dropped
    val all3 = Ensembles.modelInAllScens(df, "model", "scenario")
    assert(all3.select("model").distinct().as[String].collect().toSeq == Seq("m1"))
    // single_member: (m1, ssp370) keeps only r1
    val sm = Ensembles.singleMember(df, "model", "scenario", "member")
    assert(sm.count() == 5 &&
      sm.filter($"model" === "m1" && $"scenario" === "ssp370").count() == 1)
  }

  test("KKZ and k-means reduction pick spread members") {
    // two tight clusters + one outlier; k=3 must cover all three
    val crit = Seq(
      (0, Array(0.0, 0.0)), (1, Array(0.1, 0.0)), (2, Array(0.0, 0.1)),
      (3, Array(10.0, 10.0)), (4, Array(10.1, 10.0)),
      (5, Array(-20.0, 5.0)))
    val kkz = Reduce.kkz(crit, 3)
    assert(kkz.size == 3)
    assert(kkz.contains(5) && kkz.exists(Set(3, 4)) && kkz.exists(Set(0, 1, 2)))
    val km = Reduce.kmeansSelect(crit, 3)
    assert(km.size == 3)
    assert(km.contains(5) && km.exists(Set(3, 4)) && km.exists(Set(0, 1, 2)))
  }
}
