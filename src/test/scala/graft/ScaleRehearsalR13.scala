package graft

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 ×scale rehearsal main (test scope, run by hand — PLANS §34
  * discipline) for the session's chunk-enumeration work:
  *
  *  - a 2^20-chunk Zarr store (metadata only: every chunk absent → fill)
  *    read through the r13 range-based chunk walk. The r12 readers built
  *    the full coordinate list on the driver (~10^8 coordinates = GBs at
  *    100 TB); the rehearsal pins that driver heap stays FLAT while the
  *    scan still visits every chunk.
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR13"
  */
object ScaleRehearsalR13 {
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
    def heapMB(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory - r.freeMemory) / (1024 * 1024)
    }

    // 1024x1024 grid of 1x1 chunks = 1,048,576 chunk coordinates; no
    // chunk files exist, so every element reads as the 1.5 fill — the
    // walk is pure enumeration + stat, isolating the driver cost
    val root = java.nio.file.Files.createTempDirectory("graft_zarr_million_").toFile
    val aDir = new File(root, "a"); aDir.mkdirs()
    val meta =
      """{"zarr_format": 2, "shape": [1024, 1024], "chunks": [1, 1],
        | "dtype": "<f8", "compressor": null, "fill_value": 1.5,
        | "filters": null, "order": "C"}""".stripMargin
    java.nio.file.Files.write(new File(aDir, ".zarray").toPath,
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val h0 = heapMB()
    time("readVariable over a 1,048,576-chunk store (all chunks absent)") {
      // the .zarray fill_value doubles as the CF mask, so fill-read
      // elements surface as rows with NULL value — count both
      val r = graft.sources.Zarr.readVariable(spark, root.getPath, "a")
        .agg(count(lit(1)).as("rows"), count(col("value")).as("nonnull"))
        .collect()(0)
      require(r.getLong(0) == 1048576L, s"rows ${r.getLong(0)}")
      require(r.getLong(1) == 0L, s"nonnull ${r.getLong(1)}")
    }
    val h1 = heapMB()
    println(s"[rehearsal] driver heap before/after: $h0 MB -> $h1 MB " +
      s"(delta ${h1 - h0} MB)")
    require(h1 - h0 < 256,
      s"driver heap grew ${h1 - h0} MB over a 2^20-chunk walk — " +
        "the chunk enumeration is not flat")

    // cleanup
    new File(aDir, ".zarray").delete(); aDir.delete(); root.delete()
    spark.stop()
  }
}
