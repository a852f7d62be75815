package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 ×scale rehearsal main (test scope, run by hand — PLANS §34
  * discipline) for the incremental z-order lake tier:
  *
  *  - init a 2-D lake from 10M rows on a 4096×4096 value grid into
  *    ~512 slabs (the footer-stats manifest build included);
  *  - one LOCAL batch (100k rows confined to a 1/16 × 1/16 box): the
  *    touched set must be a small fraction of the slabs, the commit
  *    time proportional to touched+batch, untouched slabs carried by
  *    reference;
  *  - one FULL-SPAN batch (100k rows over the whole grid): the honest
  *    worst case — cost approaches a full rewrite; print it so the
  *    contrast with the local batch is on the record;
  *  - a selective box read straight off the final manifest (BIGMIN
  *    z-intervals, no per-file x/y stats): files opened must be
  *    O(matching);
  *  - slab compaction over the fragmented layout.
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR14"
  */
object ScaleRehearsalR14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.sources.ZOrderLake
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_zo_rehearsal_").toString + "/zo"
    // 10M rows spread over a 4096×4096 grid (deterministic, no RNG)
    val init = spark.range(10000000L).select(
      (col("id") * 2654435761L % 4096).as("x"),
      (col("id") * 40503L % 4096).as("y"),
      col("id").as("pay"))
    time("init 10M rows -> ~512 slabs (incl. footer manifest)") {
      ZOrderLake.init(init, root, Seq("x", "y"), targetRows = 20000)
    }
    val n0 = ZOrderLake.readManifest(root, 0).size
    println(s"[rehearsal] v0 slabs: $n0")

    // LOCAL batch: 100k rows inside a 256×256 box (1/16 per side)
    val local = spark.range(100000L).select(
      (lit(1024L) + col("id") % 256).as("x"),
      (lit(2048L) + (col("id") / 256).cast("long") % 256).as("y"),
      (col("id") + 20000000L).as("pay"))
    time("local batch (100k rows in a 1/16×1/16 box)") {
      ZOrderLake.applyBatch(local, root, targetRows = 20000, batchId = 0L)
    }
    val m1 = ZOrderLake.readManifest(root, 1)
    val carried1 = m1.count(_.path.contains("/data/v00000/"))
    println(s"[rehearsal] v1 slabs: ${m1.size}, carried from v0: " +
      s"$carried1 (rewrote ${n0 - carried1})")
    require(carried1 > n0 * 8 / 10,
      s"local batch rewrote ${n0 - carried1} of $n0 slabs — not incremental")

    // FULL-SPAN batch: the worst case, on the record for contrast
    val fullSpan = spark.range(100000L).select(
      (col("id") * 48271L % 4096).as("x"),
      (col("id") * 69621L % 4096).as("y"),
      (col("id") + 30000000L).as("pay"))
    time("full-span batch (100k rows over the whole grid — worst case)") {
      ZOrderLake.applyBatch(fullSpan, root, targetRows = 20000, batchId = 1L)
    }

    // selective box read off the manifest alone
    val box = time("box read 200×200 (BIGMIN z-intervals, no x/y stats)") {
      val b = ZOrderLake.readBox(spark, root,
        Seq(1000L, 2100L), Seq(1199L, 2299L))
      println(s"[rehearsal]   rows ${b.count()}, files opened " +
        s"${b.inputFiles.length} of ${ZOrderLake.readManifest(root,
          ZOrderLake.readPointer(root).get.version).size}")
      b
    }
    require(box.inputFiles.length * 8 <
      ZOrderLake.readManifest(root,
        ZOrderLake.readPointer(root).get.version).size,
      "box read opened more than 1/8 of the slabs")

    time("compaction over the fragmented layout") {
      val n = ZOrderLake.compact(spark, root, targetRows = 20000)
      println(s"[rehearsal]   slabs after compaction: $n")
    }
    // integrity: nothing lost across the whole sequence
    val total = ZOrderLake.current(spark, root).count()
    require(total == 10200000L, s"row count drifted: $total")
    println(s"[rehearsal] final rows: $total OK")
    ZOrderLake.destroy(root)
    spark.stop()
  }
}
