package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 ×scale rehearsal main #2 (test scope, run by hand) for the
  * PQ posting tier at volume — the numbers behind the IVFADC 100-TB
  * claim, measured instead of asserted:
  *
  *  - 1M × 64-dim vectors into a PQ index (nlists = 256, m = 8,
  *    k = 16): init + one 500k applyBatch — ingest stays O(batch) with
  *    the code column riding the same write;
  *  - at-rest layout: per-column compressed bytes across one segment
  *    (embedding vs pq_code vs vec_id) — the ADC pass's I/O fraction;
  *  - probe latency: probeTopKAdc (codes scan + top-64 exact re-rank)
  *    vs probeTopK (raw integer-grid cosine over the same probed
  *    lists) on the same query, same nprobe — and recall@10 vs the
  *    exact ranking as a function of the rerank pool (FAISS k_factor).
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR16b"
  */
object ScaleRehearsalR16b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.pipeline.IvfIndex
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dim = 64
    val nlists = 256
    val n = 1000000L
    val centroids = spark.range(nlists).select(
      col("id").cast("int").as("list"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> cast((id * 37 + j * 11) % 64 as double) / 4.0)").as("cvec"))
    def vecs(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        s"j -> cast(((id % $nlists) * 37 + j * 11) % 64 as double) / 4.0" +
        " + cast((id * 2654435761 + j * 40503) % 99991 as double) / 999910.0)"
      ).as("embedding"))

    val root = java.nio.file.Files
      .createTempDirectory("graft_r16b_").toString + "/ivf"
    time(s"init (500k x $dim, nlists=$nlists, PQ m=8 k=16)") {
      IvfIndex.init(vecs(0, n / 2), "vec_id", "embedding", centroids, root,
        pqM = 8, pqK = 16)
    }
    time("applyBatch (500k)") {
      IvfIndex.applyBatch(vecs(n / 2, n), "vec_id", "embedding", root, 0L)
    }
    println(s"[rehearsal] health: ${IvfIndex.health(root)}")

    // at-rest layout: per-column compressed bytes in segment 0
    val conf = spark.sparkContext.hadoopConfiguration
    val seg0 = IvfIndex.readManifest(root,
      IvfIndex.readPointer(root).get.version).head.dir
    val files = graft.sources.FsIo.listFilesRecursive(conf, seg0)
      .filter(_.endsWith(".parquet"))
    var embB = 0L; var codeB = 0L; var idB = 0L
    files.foreach { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf))
      try rd.getFooter.getBlocks.forEach(b => b.getColumns.forEach { c =>
        val p = c.getPath.toDotString
        if (p.startsWith("embedding")) embB += c.getTotalSize
        else if (p.startsWith("pq_code")) codeB += c.getTotalSize
        else if (p == "vec_id") idB += c.getTotalSize
      })
      finally rd.close()
    }
    println(f"[rehearsal] segment-0 bytes: embedding ${embB / 1048576.0}%.1f MiB, " +
      f"pq_code ${codeB / 1048576.0}%.1f MiB, vec_id ${idB / 1048576.0}%.1f MiB " +
      f"-> ADC scan reads ${100.0 * (codeB + idB) / (embB + codeB + idB)}%.1f%% " +
      "of posting bytes")
    require(embB > 8 * codeB,
      s"PQ code column not code-sized: $codeB vs embedding $embB")

    // probe latency + identity: ADC+rerank vs raw cosine, same lists
    val q = vecs(3, 4).select(col("embedding").as("qvec"))
      .localCheckpoint(true)
    val raw = time("probeTopK raw cosine (nprobe=8)") {
      IvfIndex.probeTopK(spark, root, q, k = 10, nprobe = 8)
        .select("vec_id").as[Long].collect().toSeq
    }
    require(raw.size == 10, "short raw probe")
    // ADC recall@10 vs rerank — the FAISS k_factor trade, measured.
    // The ADC pool is L2-ranked while refine ranks by cosine: on these
    // deliberately NON-normalized synthetic vectors the metrics
    // disagree (unlike real ~unit-norm embeddings), so small pools
    // recall poorly — and a pool covering ALL candidates (nprobe/nlists
    // × 1M ≈ 31k < 40000) must reproduce the exact cosine probe
    // bit-for-bit, which pins the two-pass plumbing end to end.
    val recalls = Seq(64, 1024, 40000).map { r =>
      val adc = time(s"probeTopKAdc rerank=$r (nprobe=8)") {
        IvfIndex.probeTopKAdc(spark, root, q, k = 10, nprobe = 8, rerank = r)
          .select("vec_id").as[Long].collect().toSeq
      }
      require(adc.size == 10, "short probe results")
      val rec = raw.count(adc.toSet.contains) / 10.0
      println(s"[rehearsal] ADC recall@10 (rerank=$r): $rec")
      (rec, adc)
    }
    require(recalls.map(_._1) == recalls.map(_._1).sorted,
      s"ADC recall not monotone in rerank: ${recalls.map(_._1)}")
    require(recalls.last._2 == raw,
      "full-pool ADC re-rank must equal the exact cosine probe")

    IvfIndex.destroy(root)
    spark.stop()
    println("[rehearsal] PASS")
  }
}
