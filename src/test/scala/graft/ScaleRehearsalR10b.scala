package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 ×scale rehearsal main for the session's corpus-hygiene
  * operators (test scope, run by hand — PLANS §34 discipline):
  * Aho–Corasick blocklist scan, engine-exact HLL, water-filling budget
  * allocation, BPE merge training, and integer-GD training at 10–100×
  * the sf0.1 row counts. Checks the shapes that must hold at 100 TB:
  * the AC scan is one shuffle-free pass whatever the list size, HLL
  * shuffles ≤ m rows per group, waterFill's window sort is bounded by
  * source cardinality, BPE iterates over the distinct-word table (not
  * the corpus), and each GD round is one narrow aggregate.
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR10b"
  */
object ScaleRehearsalR10b {
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

    // 500k synthetic docs, ~40 tokens each (~100 MB of text), vocabulary
    // rich enough that shingles/BPE see real structure
    val vocab = Seq("table", "scan", "merge", "batch", "vector", "spark",
      "stream", "filter", "window", "sorted", "bucket", "shuffle")
    val word = (i: org.apache.spark.sql.Column) =>
      concat(lit("w"), pmod(i, lit(vocab.size * 41)))
    val docs = spark.range(500000).select(col("id"),
      concat_ws(" ", (0 until 40).map(j =>
        element_at(typedLit(vocab), (pmod(col("id") * 13 + j * 7,
          lit(vocab.size)) + 1).cast("int"))): _*).as("text"),
      pmod(col("id"), lit(16)).cast("string").as("grp")).persist()
    docs.count()

    // 1) AC blocklist: one pass, list size irrelevant; only shuffle is
    // the final rollup of per-group partials
    val pats = Seq("table scan", "merge batch", "spark", "sorted bucket",
      "stream filter", "vector vector", "shuffle shuffle", "window sorted")
    val ac = docs.select(col("grp"),
        graft.functions.AhoCorasick.acScan(col("text"), pats).as("ac"))
      .groupBy("grp").agg(sum(col("ac.total_hits")).as("hits"))
    time("AC blocklist scan (500k docs x 8 patterns)") { ac.collect() }
    val acShuffles = graft.sources.Lake.countShuffles(ac)
    println(s"[rehearsal] AC plan shuffles: $acShuffles " +
      "(only the 16-group rollup; AQE may fold it out of the probe)")

    // 2) HLL over char 8-shingles per group: sketch-sized shuffle;
    // shingling through the native generator (PLANS §74)
    val sh = docs.select(col("grp"),
      graft.functions.ShingleExplode.shingleExplode(
        regexp_replace(lower(trim(col("text"))), "\\s+", " "), 8).as("sh"))
    val hll = graft.pipeline.Sketches.hllEstimate(
      graft.pipeline.Sketches.hllRegisters(sh, "grp", "sh"))
    time("HLL 16 groups x ~20M shingle rows") {
      hll.collect().foreach { r =>
        val (nz, est) = (r.getLong(1), r.getDouble(4))
        require(nz > 0 && est > 0, s"degenerate sketch row $r")
      }
    }

    // 3) water-filling over 100k sources
    val counts = spark.range(100000).select(
      concat(lit("s"), col("id")).as("src"),
      (pmod(col("id") * 2654435761L, lit(9973)) + 1).as("c"))
    val budget = counts.agg(expr("CAST(sum(c) DIV 2 AS BIGINT)").as("budget"))
    val wf = graft.pipeline.Sampling.waterFill(counts, "src", "c", budget)
    time("waterFill over 100k sources") {
      val got = wf.agg(sum(col("alloc")), max(col("capped"))).collect().head
      println(s"[rehearsal] allocated=${got.getLong(0)} capped=${got.getInt(1)}")
    }

    // 4) BPE training on the distinct-word table implied by 500k docs
    time("BPE merge training, 10 rounds") {
      val m = graft.pipeline.BpeTrain.learnMerges(docs, "text", 10).collect()
      require(m.length == 10, s"expected 10 merges, got ${m.length}")
    }

    // 5) integer-GD logistic regression, 6 rounds over 500k rows
    val feats = docs.select(lit(1L).as("x0"),
      (length(col("text")) % 37 - 18).cast("long").as("x1"),
      (pmod(col("id"), lit(21)) - 10).cast("long").as("x2"),
      when(length(col("text")) % 37 >= 18, 1L).otherwise(0L).as("y"))
    time("logreg 6 rounds x 500k rows") {
      val rows = graft.pipeline.QualityModel
        .trainLogReg(feats, Seq("x0", "x1", "x2"), "y", 6, 5).collect()
      println(s"[rehearsal] final acc ${rows.last.getLong(4)}/${rows.last.getLong(5)}")
    }

    spark.stop()
  }
}
