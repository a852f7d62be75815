package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 ×scale rehearsal main (test scope, run by hand): the
  * PRODUCTION PQ shape — FAISS's defaults are 8-bit codewords
  * (k = 256) over thousands of coarse lists, where r16's oracles
  * pinned m=8 × k=16 (4-bit) over ≤10 lists. Measured here:
  *
  *  - 1M × 64-dim vectors into nlists = 4096, m = 8, k = 256 with ONE
  *    Lloyd training round — init (sampled seeds + train + encode) and
  *    a 500k applyBatch through the codegen kernels;
  *  - kernel-vs-interpreted bit-identity at this shape on a sample
  *    (the interpreted pqCodeCol builds 256 candidate structs per
  *    subspace — the regime the kernel exists for);
  *  - codes BYTE-SIZED at rest at k = 256 (parquet dictionary+RLE keeps
  *    ARRAY<INT> codes ~m bytes/vector even at 8-bit codewords);
  *  - the CODE-ONLY tier's at-rest bytes vs the raw+codes layout on the
  *    same 200k slice — the ~32× storage cut ADC-only serving buys;
  *  - ADC probe latency at k = 256 (the m·k ADC table grows 16×; the
  *    per-candidate lookup-sum cost must not).
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR17"
  */
object ScaleRehearsalR17 {
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
    val nlists = 4096
    val n = 1000000L
    val centroids = spark.range(nlists).select(
      col("id").cast("int").as("list"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> cast((id * 37 + j * 11) % 256 as double) / 16.0)").as("cvec"))
    def vecs(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        s"j -> cast(((id % $nlists) * 37 + j * 11) % 256 as double) / 16.0" +
        " + cast((id * 2654435761L + j * 40503) % 99991 as double) / 999910.0)"
      ).as("embedding"))

    val root = java.nio.file.Files
      .createTempDirectory("graft_r17_").toString + "/ivf"
    time(s"init (500k x $dim, nlists=$nlists, PQ m=8 k=256 trained 1 round)") {
      IvfIndex.init(vecs(0, n / 2), "vec_id", "embedding", centroids, root,
        pqM = 8, pqK = 256, pqTrainIters = 1)
    }
    time("applyBatch (500k)") {
      IvfIndex.applyBatch(vecs(n / 2, n), "vec_id", "embedding", root, 0L)
    }
    println(s"[rehearsal] health: ${IvfIndex.health(root)}")

    // kernel == interpreted at the production shape (2k-row sample —
    // the interpreted form is exactly what the kernel retired)
    val conf = spark.sparkContext.hadoopConfiguration
    val cb = IvfIndex.readCodebook(spark, root, conf).get
    require(cb.length == 8 && cb(0).length == 256, "codebook shape drifted")
    time("kernel-vs-interpreted parity (2k rows, k=256)") {
      import org.apache.spark.sql.graft.ColumnBridge
      val sample = vecs(0, 2000)
      val mismatch = sample
        .withColumn("k", ColumnBridge.column(
          graft.functions.IvfKernels.PqEncodeCodes(
            ColumnBridge.expression(col("embedding")), cb)))
        .withColumn("h", IvfIndex.pqCodeCol(col("embedding"), cb))
        .filter(not(col("k") === col("h"))).count()
      require(mismatch == 0, s"$mismatch kernel/interpreted divergences")
    }

    // at-rest: codes stay byte-sized at k=256
    def colBytes(dir: String): (Long, Long, Long) = {
      var embB = 0L; var codeB = 0L; var idB = 0L
      graft.sources.FsIo.listFilesRecursive(conf, dir)
        .filter(_.endsWith(".parquet")).foreach { f =>
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
      (embB, codeB, idB)
    }
    val seg0 = IvfIndex.readManifest(root,
      IvfIndex.readPointer(root).get.version).head.dir
    val (embB, codeB, idB) = colBytes(seg0)
    println(f"[rehearsal] segment-0 bytes: embedding ${embB / 1048576.0}%.1f MiB, " +
      f"pq_code ${codeB / 1048576.0}%.1f MiB (${codeB * 1.0 / (n / 2)}%.1f B/vec), " +
      f"vec_id ${idB / 1048576.0}%.1f MiB")
    require(embB > 8 * codeB,
      s"k=256 codes not code-sized at rest: $codeB vs embedding $embB")

    // storage-tier ladder on the same 200k slice: raw+codes vs SQ8 vs
    // codes-only
    val rawRoot = java.nio.file.Files
      .createTempDirectory("graft_r17_raw_").toString + "/ivf"
    val sqRoot = java.nio.file.Files
      .createTempDirectory("graft_r17_sq_").toString + "/ivf"
    val coRoot = java.nio.file.Files
      .createTempDirectory("graft_r17_co_").toString + "/ivf"
    time("init raw+codes (200k)") {
      IvfIndex.init(vecs(0, 200000), "vec_id", "embedding", centroids,
        rawRoot, pqM = 8, pqK = 256)
    }
    time("init SQ8 (200k)") {
      IvfIndex.init(vecs(0, 200000), "vec_id", "embedding", centroids,
        sqRoot, pqM = 8, pqK = 256, sq8 = true)
    }
    time("init code-only (200k)") {
      IvfIndex.init(vecs(0, 200000), "vec_id", "embedding", centroids,
        coRoot, pqM = 8, pqK = 256, storeRaw = false)
    }
    def segTotal(r: String): Long = {
      val d = IvfIndex.readManifest(r,
        IvfIndex.readPointer(r).get.version).head.dir
      graft.sources.FsIo.listFilesRecursive(conf, d)
        .filter(_.endsWith(".parquet"))
        .map(f => graft.sources.FsIo.fs(conf, f)
          .getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    }
    val rawBytes = segTotal(rawRoot); val coBytes = segTotal(coRoot)
    val sqBytes = segTotal(sqRoot)
    println(f"[rehearsal] at-rest 200k: raw+codes ${rawBytes / 1048576.0}%.1f MiB, " +
      f"SQ8 ${sqBytes / 1048576.0}%.1f MiB " +
      f"(${rawBytes * 1.0 / sqBytes}%.1fx cut, re-rank retained), " +
      f"code-only ${coBytes / 1048576.0}%.1f MiB " +
      f"(${rawBytes * 1.0 / coBytes}%.1fx cut)")
    require(coBytes * 4 < rawBytes,
      s"code-only layout not materially smaller: $coBytes vs $rawBytes")
    require(sqBytes * 2 < rawBytes && coBytes < sqBytes,
      s"SQ8 must sit between raw ($rawBytes) and code-only ($coBytes): $sqBytes")
    // the code-only and SQ8 twins serve the identical ADC-only ranking
    val q0 = vecs(3, 4).select(col("embedding").as("qvec"))
      .localCheckpoint(true)
    val a1 = IvfIndex.probeTopKAdc(spark, rawRoot, q0, k = 10, nprobe = 8,
      rerank = 0).select("vec_id").as[Long].collect().toSeq
    val a2 = IvfIndex.probeTopKAdc(spark, coRoot, q0, k = 10, nprobe = 8,
      rerank = 0).select("vec_id").as[Long].collect().toSeq
    val a3 = IvfIndex.probeTopKAdc(spark, sqRoot, q0, k = 10, nprobe = 8,
      rerank = 0).select("vec_id").as[Long].collect().toSeq
    require(a1 == a2 && a1 == a3 && a1.size == 10,
      "tiered ADC rankings diverged from the raw index's ADC pass")
    // SQ8 decoded re-rank recall vs the raw index's exact re-rank
    val rr1 = IvfIndex.probeTopKAdc(spark, rawRoot, q0, k = 10, nprobe = 8,
      rerank = 256).select("vec_id").as[Long].collect().toSeq
    val rr2 = time("probeTopKAdc SQ8 decoded rerank=256") {
      IvfIndex.probeTopKAdc(spark, sqRoot, q0, k = 10, nprobe = 8,
        rerank = 256).select("vec_id").as[Long].collect().toSeq
    }
    println(s"[rehearsal] SQ8 decoded-rerank recall@10 vs exact: " +
      s"${rr1.count(rr2.toSet.contains) / 10.0}")
    IvfIndex.destroy(rawRoot); IvfIndex.destroy(coRoot)
    IvfIndex.destroy(sqRoot)

    // serving at k=256: ADC table is 8 x 256 int64 — still one
    // lookup-sum per candidate
    val q = vecs(3, 4).select(col("embedding").as("qvec"))
      .localCheckpoint(true)
    val raw10 = time("probeTopK raw cosine (nprobe=8)") {
      IvfIndex.probeTopK(spark, root, q, k = 10, nprobe = 8)
        .select("vec_id").as[Long].collect().toSeq
    }
    val adc10 = time("probeTopKAdc rerank=256 (nprobe=8, k=256 codes)") {
      IvfIndex.probeTopKAdc(spark, root, q, k = 10, nprobe = 8, rerank = 256)
        .select("vec_id").as[Long].collect().toSeq
    }
    require(adc10.size == 10 && raw10.size == 10, "short probe results")
    println(s"[rehearsal] ADC recall@10 (rerank=256, k=256 codes): " +
      s"${raw10.count(adc10.toSet.contains) / 10.0}")

    IvfIndex.destroy(root)
    spark.stop()
    println("[rehearsal] PASS")
  }
}
