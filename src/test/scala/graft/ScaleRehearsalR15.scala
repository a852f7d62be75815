package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 ×scale rehearsal main (test scope, run by hand — PLANS §34
  * discipline) for GRID EPOCHS under monotone ingest — the continuous
  * (time, lat, lon) climate-lake scenario the r14 verdict flagged as the
  * pinned-bounds scale-killer:
  *
  *  - init a 2-D lake from 5M rows with t ∈ [0, 86400) (one "day" of
  *    seconds) × 4096 stations → ~256 slabs; bounds pin there;
  *  - stream 8 batches of 500k rows, each strictly PAST all prior data
  *    (t advances one day per batch — the monotone worst case that,
  *    without epochs, piles every batch onto one border cell and trends
  *    per-batch rewrite cost to O(corpus));
  *  - per batch: wall time and rewritten-slab count must stay O(batch)
  *    — flat across the run, never growing with the corpus;
  *  - epochs opened must be logarithmic-ish (geometric headroom), not
  *    one per batch;
  *  - a box read on the NEWEST day × a station band must open
  *    O(matching) files despite 9 days of history across the epochs;
  *  - integrity: total rows exact after the whole sequence.
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR15"
  */
object ScaleRehearsalR15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.ZOrderLake
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_zoep_rehearsal_").toString + "/zo"
    val day = 86400L
    // day 0: 5M rows, t uniform over the day, 4096 stations
    val init = spark.range(5000000L).select(
      (col("id") * 2654435761L % day).as("t"),
      (col("id") * 40503L % 4096).as("s"),
      col("id").as("pay"))
    time("init 5M rows (day 0) -> ~256 slabs") {
      ZOrderLake.init(init, root, Seq("t", "s"), targetRows = 20000)
    }
    val n0 = ZOrderLake.readManifest(root, 0).size
    println(s"[rehearsal] v0 slabs: $n0")

    // 8 monotone batches: day b+1 each, 500k rows — strictly past ALL
    // prior data every time
    var expect = 5000000L
    for (b <- 0 until 8) {
      val lo = day * (b + 1)
      val batch = spark.range(500000L).select(
        (lit(lo) + col("id") * 2654435761L % day).as("t"),
        (col("id") * 48271L % 4096).as("s"),
        (col("id") + 100000000L * (b + 1)).as("pay"))
      val before = ZOrderLake.readPointer(root).get.version
      time(s"monotone batch $b (500k rows, day ${b + 1})") {
        ZOrderLake.applyBatch(batch, root, targetRows = 20000,
          batchId = b.toLong, retain = 20)
      }
      expect += 500000L
      val diff = ZOrderLake.changedSlabs(root, before,
        ZOrderLake.readPointer(root).get.version)
      val removed = diff.count(_._1 == "removed")
      val added = diff.count(_._1 == "added")
      println(s"[rehearsal]   rewrote $removed slabs, added $added " +
        s"(epochs now ${ZOrderLake.readEpochs(root).size})")
      // O(batch), not O(corpus): an epoch-opening batch rewrites 0; a
      // same-epoch monotone batch touches slabs only at the
      // z-interleave fragmentation boundaries of its t-range — bounded
      // by interleave geometry (≈ the s-bits above the distinguishing
      // t-bit, ≤ ~the batch's own slab count), never by history size.
      // Without epochs every batch here would clamp onto ONE border
      // cell and the removed count would grow with the corpus.
      require(removed <= 30,
        s"batch $b rewrote $removed slabs — per-batch cost is growing " +
          "with the corpus, the exact failure epochs exist to prevent")
    }
    val epochs = ZOrderLake.readEpochs(root)
    println(s"[rehearsal] epochs: ${epochs.size}; t-spans " +
      epochs.map(e => e.head.hi - e.head.lo).mkString(", "))
    require(epochs.size >= 2 && epochs.size <= 6,
      s"${epochs.size} epochs for 8 monotone batches — headroom is not " +
        "geometric (1 per batch) or never triggered")

    // box read: newest day × a 1/16 station band, across 9 days of data
    val p = ZOrderLake.readPointer(root).get
    val total = ZOrderLake.readManifest(root, p.version).size
    val box = time("box read (newest day × 256-station band)") {
      val b = ZOrderLake.readBox(spark, root,
        Seq(day * 8, 1024L), Seq(day * 9 - 1, 1279L))
      println(s"[rehearsal]   rows ${b.count()}, files opened " +
        s"${b.inputFiles.length} of $total")
      b
    }
    val full = ZOrderLake.current(spark, root)
      .filter(col("t") >= day * 8 && col("s").between(1024, 1279))
    require(box.count() == full.count(), "box read != plain filter")
    require(box.inputFiles.length * 4 < total,
      s"newest-day box opened ${box.inputFiles.length} of $total files")

    val rows = ZOrderLake.current(spark, root).count()
    require(rows == expect, s"row count drifted: $rows vs $expect")
    println(s"[rehearsal] final rows: $rows OK")
    ZOrderLake.destroy(root)
    spark.stop()
  }
}
