package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 ×10 rehearsal main (test scope, run by hand — PLANS §34
  * discipline): the Knight/merge-sort rank-statistic kernels at
  * century-scale series lengths. sf0.1 gives each entity ~2k daily
  * points; here every entity carries 36,500 (100 years daily) — the
  * length where the retired pair clouds would join 666M rows per entity
  * — across 150 entities (5.5M total points, the sf0.1 entity count).
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR10"
  */
object ScaleRehearsalR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val nEnt = 150
    val nDays = 36500
    // deterministic synthetic series with heavy ties on both margins
    // (coarse value grids — the regime that stresses tie accounting)
    val daily = spark.range(nEnt.toLong * nDays)
      .select((col("id") / nDays).cast("long").as("user_id"),
        (col("id") % nDays).as("t"),
        ((pmod(hash(col("id")), lit(400)) * lit(0.5))).as("total"),
        pmod(hash(col("id"), lit(7)), lit(30)).cast("double").as("n_events"))
      .localCheckpoint(true)
    println(s"[rehearsal] points = ${daily.count()} ($nEnt entities x $nDays days)")

    val tau = time(s"KendallCmd Knight kernel ($nDays-pt series x $nEnt)") {
      daily.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          graft.functions.MannKendallS.kendallCmd(collect_list(struct(
            col("total").as("x"), col("n_events").as("y")))).as("kt"))
        .select(col("user_id"), col("kt.cmd"), col("kt.n1"), col("kt.n2"))
        .collect()
    }
    require(tau.length == nEnt, s"expected $nEnt rows, got ${tau.length}")
    println(s"[rehearsal] tau rows = ${tau.length}, " +
      s"sample cmd = ${tau.head.getAs[Long]("cmd")}")

    val mk = time(s"MannKendallS inversion kernel (same series)") {
      daily.groupBy(col("user_id"))
        .agg(graft.functions.MannKendallS.mannKendallS(
          transform(array_sort(collect_list(struct(col("t"), col("total")))),
            x => x.getField("total"))).as("s"))
        .collect()
    }
    require(mk.length == nEnt)
    println(s"[rehearsal] mk rows = ${mk.length}")
    spark.stop()
  }
}
