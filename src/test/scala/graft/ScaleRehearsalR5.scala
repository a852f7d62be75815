package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 ×10 rehearsal main (test scope, run by hand — see PLANS §34):
  * drives the components ADDED this round at 10× the sf0.1 row counts and
  * prints wall-clock + invariants, the same "would it survive 10×?"
  * discipline as PLANS §18/§26.
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR5"
  */
object ScaleRehearsalR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- events ×60: 6M rows, same group cardinality (event_type) ----
    val events = graft.sources.Tables.events(spark, dir)
    val x10 = (0 until 60).map(i =>
      events.withColumn("value", col("value") + lit(i * 0.001)))
      .reduce(_ unionByName _)
      .select(col("event_type"), col("value"))
      .localCheckpoint(true)
    val n = x10.count()
    println(s"[rehearsal] events x60 rows = $n")

    // exact at-scale quantile plan vs the collect_list form at 6M rows
    val scale = time("hfQuantilesScale (6M rows, whole-column groups)") {
      graft.core.Stats.hfQuantilesScale(x10, Seq("event_type"), "value",
          Seq("p90" -> 0.9, "p10" -> 0.1))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    }
    val listForm = time("collect_list H&F form (same 6M rows)") {
      x10.groupBy("event_type")
        .agg(graft.core.Stats.hfQuantile(col("value"), 0.9).as("p90"),
          graft.core.Stats.hfQuantile(col("value"), 0.1).as("p10"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    }
    require(scale == listForm, "scale plan must be bit-identical at 6M rows")
    println("[rehearsal] hfQuantilesScale == collect_list form at 6M rows (bit-exact)")

    // auto-router picks the scale plan at this size
    val routed = time("hfQuantilesAuto (threshold 1M)") {
      graft.core.Stats.hfQuantilesAuto(x10, Seq("event_type"), "value",
        Seq("p90" -> 0.9), smallGroupMax = 1_000_000).count()
    }
    println(s"[rehearsal] auto-routed groups = $routed")

    // ---- Zarr: 6M-element array through write -> read, many chunks ----
    val grid = spark.range(0, 6_000_000).select(
      (col("id") / 1000).cast("int").as("time"),
      pmod(col("id"), lit(1000)).cast("int").as("x"),
      (col("id") % 97).cast("double").as("value"))
    val store = java.nio.file.Files.createTempDirectory("zarr_rehearsal_").toString
    time("Zarr write 6M elements (93 chunks)") {
      graft.sources.Zarr.writeArray(grid, store, "v", targetChunkElems = 1 << 16)
    }
    val meta = graft.sources.Zarr.readArrayMeta(store, "v")
    val nChunks = meta.shape.zip(meta.chunks)
      .map { case (d, c) => (d + c - 1) / c }.product
    println(s"[rehearsal] zarr chunks = $nChunks, chunkDims = ${meta.chunks}")
    val sums = time("Zarr read 6M elements + aggregate") {
      graft.sources.Zarr.readVariable(spark, store, "v")
        .agg(count(lit(1)), sum("value")).head()
    }
    require(sums.getLong(0) == 6_000_000L, s"row count ${sums.getLong(0)}")
    val expected = grid.agg(sum("value")).head().getDouble(0)
    require(math.abs(sums.getDouble(1) - expected) < 1e-6, "sum mismatch")
    println("[rehearsal] zarr round trip exact at 6M elements")

    // ---- prefix-filtered postings join on a Zipfian ×10 corpus ----
    val rng = new scala.util.Random(3)
    val stop = Vector("the", "of", "and", "to", "in", "a", "is")
    val docs = (0 until 60000).flatMap { i =>
      val content = Seq.fill(8)(s"w${rng.nextInt(40000)}")
      val glue = Seq.fill(8)(stop(rng.nextInt(stop.length)))
      val text = rng.shuffle(content ++ glue).mkString(" ")
      // 1-in-50 docs get a planted near-clone so the join has real pairs
      if (i % 50 == 0) Seq((i.toLong, text), (i + 100000L, text + " tail"))
      else Seq((i.toLong, text))
    }.toDF("doc_id", "text").withColumn("blk", lit(1)).localCheckpoint(true)
    val postings = docs.select(col("doc_id"),
      explode(array_distinct(graft.pipeline.TextStats.wordNgrams(col("text"), 2))).as("tok"))
    val full = postings.count()
    val dfTab = postings.groupBy("tok").count()
    // candidate bound of the UNFILTERED postings self-join: Σ df² — vs the
    // df-ordered prefix, which indexes each doc's |d|−⌈t|d|⌉+1 RAREST
    // tokens, so the hot (stopword) postings never reach the join
    val pairsFull = dfTab.agg(sum(col("count") * col("count"))).head().getLong(0)
    val prefPostings = postings
      .join(dfTab.withColumnRenamed("count", "_df"), "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("_df"), col("tok")))).as("o"))
      .select(col("doc_id"), explode(slice(col("o"), lit(1),
        (size(col("o")) - ceil(lit(0.5) * size(col("o"))) + 1).cast("int"))).as("pt"))
      .select(col("doc_id"), col("pt.tok").as("tok"))
    val prefCount = prefPostings.count()
    val pairsPref = prefPostings.groupBy("tok").count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    println(s"[rehearsal] prefix filter: postings $full -> $prefCount; " +
      s"pair candidates bound $pairsFull -> $pairsPref " +
      f"(${pairsFull.toDouble / pairsPref}%.0fx reduction)")
    val t0 = System.nanoTime()
    val cut = graft.pipeline.Dedup.jaccardPairsByIndex(
      docs, "doc_id", "text", Seq("blk"), 2, 0.5).count()
    println(f"[rehearsal] prefix join (60k docs): ${(System.nanoTime() - t0) / 1e9}%.2f s, $cut pairs")

    // ---- semanticDedup x10: 110k vectors, one 10k-row degenerate cluster ----
    // Unit basis vectors e_{hash(id) mod dim}: cosine is exactly 1 inside a
    // (cluster, basis) class and 0 across, so the near-pair total has a
    // closed form (sum n·(n−1)/2) the pair join is REQUIRED to match. The
    // 10k junk cluster exercises the triangle-salting guard at cap 2000
    // (5 shards — hottest task ~2·cap rows instead of 10k).
    {
      val dim = 16
      val basis = pmod(xxhash64(col("id")), lit(dim)).cast("int")
      val emb = spark.range(0, 110000).select(
        col("id"),
        when(col("id") < 100000, pmod(col("id"), lit(500)))
          .otherwise(lit(9999)).cast("int").as("cluster"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => when(j.cast("int") === basis, lit(1.0f)).otherwise(lit(0.0f))).as("v"))
        .localCheckpoint(true)
      val expectedNear = emb.groupBy(col("cluster"), basis.as("b")).count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
      val tSem = System.nanoTime()
      val res = graft.pipeline.Similarity
        .semanticDedup(emb, "id", "v", "cluster", 0.9, clusterCap = 2000)
        .agg(sum(col("n_near")), sum(lit(1) - col("kept"))).head()
      println(f"[rehearsal] semanticDedup (110k vecs, 10k skew cluster, cap 2000): " +
        f"${(System.nanoTime() - tSem) / 1e9}%.2f s, " +
        s"nearPairs=${res.getLong(0)}, dropped=${res.getLong(1)}")
      require(res.getLong(0) == expectedNear,
        s"near-pair closed form: ${res.getLong(0)} vs $expectedNear")
    }

    // ---- streaming near-dup ingest: per-batch cost across a growing corpus ----
    {
      import graft.streaming.StatefulDedup
      import graft.streaming.StatefulDedup.Doc
      implicit val sqlCtx = spark.sqlContext
      val srng = new scala.util.Random(9)
      def sdoc(): String =
        Seq.fill(12)(s"t${srng.nextInt(5000)}").mkString(" ")
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
      // 4 bands x 4 rows: FP rate ~ J^4 per band, so candidate volume is
      // governed by real overlap, not corpus-squared noise
      val q = StatefulDedup.lshCandidates(in.toDS(), ngram = 2,
          numHashes = 16, bands = 4).writeStream
        .format("memory").queryName("rehearsal_lsh").outputMode("append").start()
      val qe = StatefulDedup.exactDedup(in.toDS()).writeStream
        .format("memory").queryName("rehearsal_exact").outputMode("append").start()
      try {
        var id = 0L
        for (batch <- 1 to 4) {
          val docs = (0 until 10000).map { _ =>
            id += 1
            // 10% exact dups of earlier ids keep bucket state realistic
            // 10% exact dups across 50 disjoint clone classes (class texts
            // share no n-gram, so cross-class J = 0)
            if (id % 10 == 0) Doc(id, Seq.fill(6)(s"c${id % 500}").mkString(" "))
            else Doc(id, sdoc())
          }
          val tb = System.nanoTime()
          in.addData(docs)
          q.processAllAvailable(); qe.processAllAvailable()
          println(f"[rehearsal] streaming batch $batch (10k docs, corpus ${id}): " +
            f"${(System.nanoTime() - tb) / 1e9}%.2f s, " +
            s"cands=${spark.table("rehearsal_lsh").count()}, " +
            s"dups=${spark.table("rehearsal_exact").where("not isFirst").count()}")
        }
      } finally { q.stop(); qe.stop() }
    }

    // ---- paragraph dedup: 500k docs x 6 paras, duplication-heavy pool ----
    // 3M paragraph instances over a 60k-distinct pool (50x duplication).
    // The ownership shuffle carries (id, pos, hash) triples only; cost
    // should scale with INSTANCES (narrow), never instances².
    {
      val mult = Seq(7, 11, 13, 17, 19, 23) // each coprime with 60000: full residue coverage
      val docs = spark.range(0, 500000).select(col("id").as("doc_id"),
        concat_ws("\n\n", (0 until 6).map(j =>
          concat(lit(s"paragraph body $j "),
            ((col("id") * mult(j) + j) % 60000).cast("string"))): _*).as("text"))
        .localCheckpoint(true)
      val out = time("paragraphDedup (500k docs, 3M paras, 50x dup)") {
        val o = graft.pipeline.Dedup.paragraphDedup(docs, "doc_id", "text")
          .agg(count(lit(1)).as("docs"), sum(col("n_paras")).as("paras"),
            sum(col("n_kept")).as("kept")).collect()(0)
        (o.getLong(0), o.getLong(1), o.getLong(2))
      }
      // kept = number of DISTINCT paragraphs corpus-wide (each survives once)
      val distinctParas = 6L * 60000
      println(s"[rehearsal] paragraphDedup docs=${out._1} paras=${out._2} kept=${out._3}")
      require(out._1 == 500000 && out._2 == 3000000, "row accounting")
      require(out._3 == distinctParas, s"kept ${out._3} != distinct pool $distinctParas")
    }

    // ---- heavy hitters: 6M Zipf-ish keys, vocab 100k >> k=256 counters ----
    // the sketch partials evict constantly across 32 partitions; the
    // lossless contract (minFrac 0.01 > 1/257) must still reproduce the
    // exact group-by/HAVING answer, with only a <=256-row broadcast where
    // the naive plan shuffles a 100k-key aggregation.
    {
      val n = 6000000L
      // f(u) ~ planted heavies on a long uniform tail: key "h<j>" for
      // j = u mod 37 < 5 (5 heavy keys ~ 1/37 each), else "t<u mod 100000>"
      val keys = spark.range(0, n).select(
        when(col("id") % 37 < 5, concat(lit("h"), (col("id") % 37).cast("string")))
          .otherwise(concat(lit("t"), (col("id") % 100000).cast("string"))).as("k"))
        .localCheckpoint(true)
      val got = time("heavyHitters (6M rows, 100k vocab, k=256)") {
        graft.pipeline.TextStats.heavyHitters(keys, "k", minFrac = 0.01, k = 256)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val want = time("exact group-by/HAVING (same rows)") {
        keys.groupBy("k").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= math.ceil(0.01 * n).toLong)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      require(got == want, s"sketch-pruned output diverges: $got vs $want")
      println(s"[rehearsal] heavyHitters found ${got.size} keys (expect 5)")
    }
    spark.stop()
  }
}
