package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 ×scale rehearsal main (test scope, run by hand — PLANS §34
  * discipline) for the session's lake + shuffle + winnow work:
  *
  *  - streaming MERGE into a 2M-row bucketed snapshot, three 20k-row
  *    change batches through the foreachBatch sink — the snapshot side
  *    must stay shuffle-free under the merge join (LakeSpec proves the
  *    plan; this proves the wall-clock at ×20 the oracle size);
  *  - epoch shuffle over 5M ids — one balanced range-sort + two-pass
  *    positions, validated as an exact permutation;
  *  - WinnowExplode over 500k docs (~100 MB) — the fingerprint pass
  *    must run scan-stage-only (zero shuffles in the plan).
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR11"
  */
object ScaleRehearsalR11 {
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

    // 1) streaming MERGE: 2M-row snapshot, 3 batches x 20k changes
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
    val table = "rehearsal_merge_snap"
    val finalSnap = time("streaming MERGE: 2M snapshot, 3 x 20k changes") {
      val out = graft.streaming.Streams
        .mergeReplay(spark, snap, batches, table, "k", 32)
      out.count()
    }
    println(s"[rehearsal] final snapshot rows = $finalSnap")
    require(finalSnap > 1900000, s"snapshot shrank unexpectedly: $finalSnap")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")

    // 2) epoch shuffle over 5M ids: exact permutation at scale
    val ids = spark.range(5000000).toDF("id")
    time("epochShuffle over 5M ids (sort + zipWithIndex)") {
      val agg = graft.pipeline.Sampling.epochShuffle(ids, col("id"), epoch = 3)
        .agg(count(lit(1)).as("n"), max(col("shuffle_pos")).as("mx"),
          countDistinct(col("shuffle_pos")).as("nd")).collect().head
      require(agg.getLong(0) == 5000000L && agg.getLong(1) == 4999999L &&
        agg.getLong(2) == 5000000L, s"not a permutation: $agg")
    }

    // 3) WinnowExplode over 500k docs: scan-stage only
    val filler = Seq("table", "scan", "merge", "batch", "vector", "spark",
      "stream", "filter", "window", "sorted", "bucket", "shuffle")
    val docs = spark.range(500000).select(col("id"),
      concat_ws(" ", (0 until 40).map(j =>
        element_at(typedLit(filler), (pmod(col("id") * 13 + j * 7,
          lit(filler.size)) + 1).cast("int"))): _*).as("text"))
    val fps = graft.pipeline.TextStats
      .winnowFingerprints(docs, "id", "text", k = 5, w = 8)
    val nShuffles = graft.sources.Lake.countShuffles(
      fps.groupBy().count()) // only the final 1-row count may shuffle
    println(s"[rehearsal] winnow plan shuffles (incl. count rollup): $nShuffles")
    require(nShuffles <= 1, s"winnow fingerprint pass must not shuffle: $nShuffles")
    time("WinnowExplode over 500k docs (~100 MB)") {
      val n = fps.count()
      println(s"[rehearsal] fingerprints = $n")
      require(n > 10000000L, s"suspiciously few fingerprints: $n")
    }
    spark.stop()
  }
}
