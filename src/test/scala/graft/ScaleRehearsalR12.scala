package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 ×scale rehearsal main (test scope, run by hand — PLANS §34
  * discipline) for the session's lake + shuffle work:
  *
  *  - VERSIONED streaming MERGE into a 2M-row bucketed snapshot, three
  *    20k-row change batches through the pointer-swap sink — same
  *    scenario as ScaleRehearsalR11's in-place row, so the two forms'
  *    wall-clocks are directly comparable (the versioned form skips the
  *    localCheckpoint materialization the in-place rewrite needs);
  *  - epochShuffle over 5M ids through the r12 DataFrame-side two-pass
  *    position assign (no RDD detour) — must stay an exact permutation
  *    and at-or-under the r11 zipWithIndex number (~6 s).
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR12"
  */
object ScaleRehearsalR12 {
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

    // 1) versioned streaming MERGE: 2M-row snapshot, 3 batches x 20k changes
    val snap = spark.range(2000000).select(col("id").as("k"),
      concat(lit("s"), col("id")).as("s"), (col("id") * 2.0).as("v"))
    val batches = (1 to 3).map { b =>
      spark.range(20000).select(
        (col("id") * 100 + b).as("k"), // mostly-disjoint touch sets
        when(pmod(col("id"), lit(3)) === 0, "update")
          .when(pmod(col("id"), lit(3)) === 1, "delete")
          .otherwise("insert").as("op"),
        concat(lit("b"), lit(b), lit("_"), col("id")).as("s"),
        (col("id") + b * 1.0).as("v"))
    }
    val root = java.nio.file.Files.createTempDirectory("graft_vlake_reh_").toString
    val table = "rehearsal_vlake_snap"
    val finalSnap = time("VERSIONED streaming MERGE: 2M snapshot, 3 x 20k changes") {
      val out = graft.streaming.Streams
        .mergeReplayVersioned(spark, snap, batches, root, table, "k", 32)
      out.count()
    }
    val p = graft.sources.VersionedLake.readPointer(root).get
    println(s"[rehearsal] final snapshot rows = $finalSnap, pointer = $p")
    require(finalSnap > 1900000, s"snapshot shrank unexpectedly: $finalSnap")
    require(p.version == 3 && p.lastBatch == 2L, s"unexpected pointer $p")
    graft.sources.VersionedLake.destroy(spark, root, table)

    // 2) epoch shuffle over 5M ids: exact permutation, DataFrame-side
    val ids = spark.range(5000000).toDF("id")
    time("epochShuffle over 5M ids (DataFrame two-pass positions)") {
      val agg = graft.pipeline.Sampling.epochShuffle(ids, col("id"), epoch = 3)
        .agg(count(lit(1)).as("n"), max(col("shuffle_pos")).as("mx"),
          countDistinct(col("shuffle_pos")).as("nd")).collect().head
      require(agg.getLong(0) == 5000000L && agg.getLong(1) == 4999999L &&
        agg.getLong(2) == 5000000L, s"not a permutation: $agg")
    }

    // 3) corpus export: 500k ~200-byte docs through writeStrings (one
    // leading-dim range shuffle, one chunk file per 64k-element chunk,
    // executors write in parallel, driver touches only metadata) and a
    // full read-back count through the chunk-parallel reader
    val docs = spark.range(500000).select(col("id").cast("int").as("doc"),
      concat(lit("doc_"), col("id"), lit("_"),
        sha2(col("id").cast("string"), 256)).as("value"))
    val wstore = java.nio.file.Files.createTempDirectory("graft_wstr_reh_").toString
    time("writeStrings: 500k docs -> |O vlen-utf8 store") {
      graft.sources.Zarr.writeStrings(docs, wstore, "corpus",
        targetChunkElems = 1 << 16)
    }
    time("readStrings: full read-back of the 500k-doc store") {
      val n = graft.sources.Zarr.readStrings(spark, wstore, "corpus")
        .where(col("value").isNotNull).count()
      require(n == 500000L, s"round trip lost rows: $n")
    }

    // 4) temperature mixture over 10M rows x 100 zipf-ish groups: one
    // count aggregate + two 1-to-100-row broadcasts + a scan-side filter
    // — no data-sized shuffle beyond the count
    val corpus = spark.range(10000000).select(col("id"),
      concat(lit("g"), pmod(pmod(col("id"), lit(997)) * pmod(col("id"), lit(991)),
        lit(100))).as("grp"))
    time("temperatureMixture alpha=0.5 over 10M rows, 100 groups") {
      val kept = graft.pipeline.Sampling
        .temperatureMixture(corpus, "grp", col("id"), alpha = 0.5)
        .count()
      require(kept > 0 && kept < 10000000L, s"degenerate sample: $kept")
      println(s"[rehearsal]   kept $kept of 10000000")
    }
    spark.stop()
  }
}
