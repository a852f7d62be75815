package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 ×scale rehearsal main (test scope, run by hand — PLANS §34
  * discipline) for the IVF coarse quantizer's CHUNKED regime — the r15
  * verdict's packed-row finding: one `collect_list` row of all
  * centroids is O(nlists × dim) bytes (~600 MB at nlists = 10^5,
  * dim = 768), so past [[graft.pipeline.IvfIndex.ChunkLists]] the
  * quantizer switches to bounded broadcast chunk rows + a narrow
  * groupBy(vec_id) arg-min + an equi-join back. This rehearsal pins,
  * at nlists = 4500 (> the 4096 chunk bound → 2 chunks):
  *
  *  - BIT-IDENTITY: the chunked assignment equals the single-row
  *    assignment on the same data (force both regimes via the chunk
  *    size test hook) — every (vec_id, list, _d2u) triple, including
  *    d2 ties broken toward the smaller list;
  *  - ingest through the full index path (init + applyBatch) works and
  *    stays O(batch) at this nlists;
  *  - batched probes equal single probes per query with the chunked
  *    probe-list merge (flatten + re-sort + slice across chunk rows).
  *
  *   sbt "Test/runMain graft.ScaleRehearsalR16"
  */
object ScaleRehearsalR16 {
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

    val dim = 32
    val nlists = 4500 // > ChunkLists (4096) → 2 chunks
    val nvecs = 20000
    // deterministic pseudo-random centroids in [0,10)^dim and vectors
    // near (but not exactly on) them — close centroid pairs exist, so
    // the arg-min genuinely exercises tie-ish comparisons
    val centroids = spark.range(nlists).select(
      col("id").cast("int").as("list"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> cast((id * 37 + j * 11) % 100 as double) / 10.0)").as("cvec"))
    val vecs = spark.range(nvecs).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        s"j -> cast(((id % $nlists) * 37 + j * 11) % 100 as double) / 10.0" +
        " + cast((id * 31 + j * 7) % 10 as double) / 1000.0)").as("embedding"))

    // 1) THREE-WAY bit-identity: the codegen'd broadcast kernel
    // (default), the HOF single-row regime (forced), and the HOF
    // chunked regime (2 chunks) must agree on every
    // (vec_id, list, _d2u) triple — d2 ties included
    def run(label: String, chunk: Int, kernel: Boolean) =
      time(s"assign $label (20k x 4500)") {
        IvfIndex.assignWithDist(vecs, "vec_id", "embedding", centroids,
            chunkLists = chunk, useKernel = kernel)
          .select("vec_id", "list", "_d2u").as[(Long, Int, Long)]
          .collect().sortBy(_._1)
      }
    val kern    = run("codegen kernel", IvfIndex.ChunkLists, kernel = true)
    val single  = run("HOF single-row (forced)", nlists + 1, kernel = false)
    val chunked = run("HOF chunked (2 chunks)", IvfIndex.ChunkLists,
      kernel = false)
    require(kern.length == nvecs && single.length == nvecs &&
      chunked.length == nvecs, "row loss across regimes")
    require(java.util.Arrays.equals(
        single.asInstanceOf[Array[AnyRef]], chunked.asInstanceOf[Array[AnyRef]]),
      "chunked assignment diverged from the single-row regime")
    require(java.util.Arrays.equals(
        kern.asInstanceOf[Array[AnyRef]], single.asInstanceOf[Array[AnyRef]]),
      "kernel assignment diverged from the HOF regimes")
    println(s"[rehearsal] kernel == HOF-single == HOF-chunked on all " +
      s"$nvecs assignments")

    // 1b) PQ encode bit-identity: codegen kernel vs the interpreted
    // Column form, same deterministic sampled codebook
    val cb: Array[Array[Array[Long]]] = {
      val seeds = vecs.orderBy("vec_id").limit(16)
        .select(expr("transform(embedding, x -> " +
          "cast(floor(x * 1e6 + 0.5) as long))"))
        .collect().map(_.getSeq[Long](0).toArray)
      Array.tabulate(8, 16)((s, j) => seeds(j).slice(s * 4, (s + 1) * 4))
    }
    import org.apache.spark.sql.graft.ColumnBridge
    val pqKern = time("pq encode kernel (20k)") {
      vecs.select(col("vec_id"), ColumnBridge.column(
          graft.functions.IvfKernels.PqEncodeCodes(
            ColumnBridge.expression(col("embedding")), cb)).as("c"))
        .select(col("vec_id"), col("c").cast("string"))
        .as[(Long, String)].collect().sortBy(_._1)
    }
    val pqHof = time("pq encode HOF (20k)") {
      vecs.select(col("vec_id"),
          IvfIndex.pqCodeCol(col("embedding"), cb).as("c"))
        .select(col("vec_id"), col("c").cast("string"))
        .as[(Long, String)].collect().sortBy(_._1)
    }
    require(java.util.Arrays.equals(
        pqKern.asInstanceOf[Array[AnyRef]], pqHof.asInstanceOf[Array[AnyRef]]),
      "PQ kernel codes diverged from the Column form")
    println(s"[rehearsal] PQ kernel == HOF codes on all $nvecs vectors")

    // 2) the full index path at nlists=4500: init + one batch + probes
    val root = java.nio.file.Files
      .createTempDirectory("graft_r16_").toString + "/ivf"
    time("init (10k vectors, 4500 lists)") {
      IvfIndex.init(vecs.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", centroids, root)
    }
    time("applyBatch (10k vectors)") {
      IvfIndex.applyBatch(vecs.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", root, 0L)
    }
    val h = IvfIndex.health(root)
    println(s"[rehearsal] health: $h")
    require(h.postingSegs == 2 && h.drift.exists(d => d > 0.5 && d < 2.0),
      s"unexpected health at scale: $h")

    // 3) batched probes == single probes, chunked probe-list merge
    val queries = vecs.filter(col("vec_id").isin(3L, 77L, 4242L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batched = time("probeTopKBatch (3 queries, nprobe=4)") {
      IvfIndex.probeTopKBatch(spark, root, queries, k = 5, nprobe = 4)
        .orderBy("qid", "rank")
        .select("qid", "rank", "vec_id").as[(Long, Int, Long)].collect().toSeq
    }
    for (q <- Seq(3L, 77L, 4242L)) {
      val single = IvfIndex.probeTopK(spark, root,
          vecs.filter(col("vec_id") === q).select(col("embedding").as("qvec")),
          k = 5, nprobe = 4)
        .orderBy("rank").select("rank", "vec_id").as[(Int, Long)].collect().toSeq
      val b = batched.filter(_._1 == q).map(t => (t._2, t._3))
      require(b == single, s"qid=$q: batched $b != single $single")
    }
    println("[rehearsal] batched probes == single probes at nlists=4500")

    IvfIndex.destroy(root)
    spark.stop()
    println("[rehearsal] PASS")
  }
}
