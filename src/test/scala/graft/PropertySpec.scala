package graft

import graft.core.{Runs, Time}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomised-but-seeded property checks: the islands toolkit against a
  * brute-force reference, and resample-period algebra invariants. */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bruteRuns(mask: Seq[Boolean]): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var cur = 0
    mask.foreach { m => if (m) cur += 1 else { if (cur > 0) out += cur; cur = 0 } }
    if (cur > 0) out += cur
    out.toSeq
  }

  test("runTable matches brute-force run lengths on random masks") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rng.nextInt(60)
      val mask = Seq.fill(n)(rng.nextDouble() < 0.55)
      val df = mask.zipWithIndex.map { case (m, i) => (0L, i, if (m) 1.0 else 0.0) }
        .toDF("location_id", "t", "v")
      val got = Runs.runTable(df, Seq("location_id"), col("t"), col("v") > 0.5)
        .orderBy("run_start").collect().map(_.getAs[Long]("run_len").toInt).toSeq
      assert(got == bruteRuns(mask), s"trial $trial mask=$mask")
    }
  }

  test("resamplePeriod invariants: start <= ts < end, idempotent") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val stamps = Seq.fill(200) {
      val epoch = 800000000L + (rng.nextDouble() * 8e8).toLong // 1995..2020
      new java.sql.Timestamp(epoch * 1000L)
    }
    val df = stamps.toDF("ts")
    for (freq <- Seq("MS", "YS", "YS-JUL", "QS-DEC", "7D", "W", "D", "h", "3MS")) {
      val p = Time.resamplePeriod(col("ts"), freq)
      val bad = df.select(col("ts"), p.as("p"),
          Time.periodEnd(p, freq).as("pe"),
          Time.resamplePeriod(p, freq).as("pp"))
        .filter(!(col("p") <= col("ts") && col("ts") < col("pe") && col("p") === col("pp")))
        .count()
      assert(bad == 0, s"freq $freq violated period invariants")
    }
  }
}
