package graft

import graft.indices.Fire
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Canadian FWI system + McArthur Mark 5 kernels. */
class FireSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("day-length tables select the right latitude band") {
    assert(Fire.dayLength(-45, 1) == 11.5)
    assert(Fire.dayLength(-20, 12) == 10.2)
    assert(Fire.dayLength(0, 7) == 9.0)
    assert(Fire.dayLength(20, 6) == 10.2)
    assert(Fire.dayLength(45, 5) == 13.9)
    assert(Fire.dayLengthFactor(-45, 1) == 6.4)
    assert(Fire.dayLengthFactor(0, 3) == 1.39)
    assert(Fire.dayLengthFactor(45, 7) == 6.4)
  }

  test("ffmc step: equilibrium, rain wetting, bounds") {
    // dry hot windy day raises ffmc toward (bounded by) 101
    val dry = Fire.ffmcStep(t = 30, p = 0, w = 25, h = 20, ffmc0 = 85)
    assert(dry > 85 && dry <= 101)
    // heavy rain drops it
    val wet = Fire.ffmcStep(t = 15, p = 25, w = 10, h = 90, ffmc0 = 85)
    assert(wet < 60)
    // invariant: output always in [0, 101]
    for (f0 <- Seq(0.0, 50.0, 101.0); p <- Seq(0.0, 2.0, 60.0)) {
      val f = Fire.ffmcStep(t = 20, p = p, w = 15, h = 50, ffmc0 = f0)
      assert(f >= 0 && f <= 101)
    }
  }

  test("dmc and dc: dry days accumulate, rain resets downward") {
    val dmcDry = Fire.dmcStep(t = 25, p = 0, h = 30, mth = 7, lat = 46, dmc0 = 6)
    assert(dmcDry > 6)
    val dmcRain = Fire.dmcStep(t = 15, p = 20, h = 80, mth = 7, lat = 46, dmc0 = 30)
    assert(dmcRain < 30)
    val dcDry = Fire.dcStep(t = 25, p = 0, mth = 7, lat = 46, dc0 = 15)
    assert(dcDry > 15)
    val dcRain = Fire.dcStep(t = 15, p = 30, mth = 7, lat = 46, dc0 = 300)
    assert(dcRain < 300)
    // cold day: dmc unchanged modulo rk=0, dc adds only the day-length term
    assert(Fire.dmcStep(t = -5, p = 0, h = 50, mth = 1, lat = 46, dmc0 = 6) == 6.0)
  }

  test("cffwis codes kernel runs the recursion per entity in time order") {
    import spark.implicits._
    // two entities, 5 dry hot days: codes must be strictly increasing for
    // dmc/dc and the kernel must not mix entities
    val rows = for (k <- Seq(1L, 2L); d <- 1 to 5)
      yield (k, d, 28.0, 0.0, 20.0, 25.0, 7, 46.0)
    val df = rows.toDF("key", "t", "temp", "rain", "wind", "hum", "mth", "lat")
    val out = Fire.cffwisCodes(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3), r.getDouble(4)))
      .groupBy(_._1)
    for ((_, g) <- out) {
      val dmcs = g.sortBy(_._2).map(_._3).toSeq
      assert(dmcs == dmcs.sorted && dmcs.distinct.size == 5)
    }
    // both entities see identical inputs -> identical trajectories
    assert(out(1L).map(x => (x._2, x._3, x._4)).toSet ==
      out(2L).map(x => (x._2, x._3, x._4)).toSet)
  }

  test("wf93 fire season: starts after 3 hot days, ends after 3 cold days") {
    import spark.implicits._
    val temps = Seq(15.0, 15, 15, 15, 15, 15, // warm: on from day 5 (start idx quirk)
      2, 2, 2, // cold run
      2, 15, 15)
    val df = temps.zipWithIndex.map { case (tp, i) => (1L, i + 1, tp) }
      .toDF("key", "t", "temp")
    val mask = Fire.fireSeasonWF93(df).orderBy("t")
      .select("fire_season").collect().map(_.getBoolean(0)).toSeq
    // reference starts evaluating at index nDays+1 (0-based) -> first 4 days off
    assert(mask.take(4) == Seq(false, false, false, false))
    assert(mask(4) && mask(5) && mask(6)) // on while warm (and 1-2 cold days)
    assert(!mask(9) && !mask(10)) // off after 3 consecutive cold days
  }

  test("overwintering dc and mcarthur ffdi scalar forms") {
    import spark.implicits._
    val df = Seq((300.0, 100.0)).toDF("dcf", "wpr")
    val dcs = df.select(Fire.overwinteringDroughtCode(col("dcf"), col("wpr")).as("v"))
      .head().getDouble(0)
    // Qf = 800*exp(-0.75)=377.9; Qs = 0.75*377.9 + 0.75*394 = 578.9; DCs = 400*ln(800/578.9)
    assert(math.abs(dcs - 400.0 * math.log(800.0 / (0.75 * 800.0 * math.exp(-0.75) + 0.75 * 3.94 * 100.0))) < 1e-9)
    val ffdi = Seq((10.0, 35.0, 15.0, 30.0)).toDF("df", "tmax", "hurs", "wind")
      .select(Fire.mcarthurFfdi(col("df"), col("tmax"), col("hurs"), col("wind")).as("v"))
      .head().getDouble(0)
    assert(ffdi > 20 && ffdi < 60) // severe-ish fire weather
  }

  test("kbdi kernel: rainfall runoff bookkeeping and cap") {
    import spark.implicits._
    // day 1: 10mm rain but first 5mm is runoff -> deficit reduced by ~5
    // long dry stretch pushes kbdi up; cap at 203.2
    val rows = (1 to 60).map { d =>
      (1L, d, if (d == 1) 10.0 else 0.0, 38.0, 500.0)
    }
    val out = Fire.keetchByramDroughtIndex(
        rows.toDF("key", "t", "rain", "tmax", "pa"))
      .orderBy("t").select("kbdi").collect().map(_.getDouble(0))
    assert(out.head == 0.0) // ET on day1 from kbdi=0 is tiny; rain keeps it at 0
    assert(out.last > out.head)
    assert(out.forall(v => v >= 0 && v <= 203.2))
    val diffs = out.sliding(2).map(a => a(1) - a(0)).toSeq
    assert(diffs.tail.forall(_ >= 0)) // monotone non-decreasing when dry
  }

  test("griffiths drought factor: no rain -> df driven by smd alone, capped at 10") {
    import spark.implicits._
    val rows = (1 to 25).map(d => (1L, d, 0.0, 100.0))
    val out = Fire.griffithsDroughtFactor(rows.toDF("key", "t", "rain", "smd"))
      .orderBy("t").collect()
    assert(out.length == 6) // first 19 days dropped
    // x=1 (no events) -> xlim for smd=100: 75/(270.525-126.7)=0.5215...
    val x = 75.0 / (270.525 - 1.267 * 100.0)
    // the exponential rides the q6 floor grid (r17 GateSpec migration)
    val expect = math.min(10.5 * (1 - Fire.q6(math.exp(-130.0 / 40))) *
      (41 * x * x + x) / (40 * x * x + x + 1), 10.0)
    assert(math.abs(out.head.getDouble(2) - expect) < 1e-9)
  }
}
