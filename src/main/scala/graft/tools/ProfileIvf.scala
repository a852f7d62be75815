package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r17 optimization round): phase-level wall-clock breakdown of
  * the q_ivf_sq8-shaped fixture — where do the ~9 s go (init, per-batch
  * commits, probe, final agg)? Usage: runMain graft.tools.ProfileIvf <sfDir> */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    val e = graft.sources.Tables.table(spark, dir, "embeddings")
    e.count() // warm page cache
    for (p <- 1 to 2) {
      println(s"=== pass $p ===")
      val m = pmod(col("vec_id"), lit(4))
      val init = e.filter(m === 3)
      val batches = Seq(0, 1, 2).map(i => e.filter(m === i))
      val cent = phase("centroids") {
        init.select(col("label").cast("int").as("list"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("list"), col("pos"))
          .agg(avg(col("x").cast("double")).as("mm"))
          .groupBy(col("list"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("mm")))),
            st => st.getField("mm")).as("cvec"))
          .localCheckpoint(true)
      }
      val root = java.nio.file.Files
        .createTempDirectory("graft_ivfprof_").toString + "/ivf"
      import graft.pipeline.IvfIndex
      phase("init(sq8+pq)") {
        IvfIndex.init(init, "vec_id", "embedding", cent, root,
          pqM = 8, pqK = 16, sq8 = true)
      }
      batches.zipWithIndex.foreach { case (b, i) =>
        phase(s"applyBatch $i") {
          IvfIndex.applyBatch(b, "vec_id", "embedding", root, i.toLong)
        }
      }
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      val probe = phase("probeTopKAdc build+agg") {
        IvfIndex.probeTopKAdc(spark, root, q, k = 5, nprobe = 3, rerank = 20)
          .agg(count(lit(1)).as("probe_n"), sum(col("vec_id")).as("probe_ids"),
            max(col("cosine")).as("probe_max"), sum(col("adc_u")).as("probe_adc"))
      }
      val fin = IvfIndex.currentAll(spark, root)
      val out = phase("final agg + checkpoint") {
        fin.groupBy(col("list"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("id_sum"))
          .crossJoin(probe)
          .localCheckpoint(true)
      }
      phase("noop sink") {
        out.write.format("noop").mode("overwrite").save()
      }
      phase("destroy") { IvfIndex.destroy(root) }
      // and the streaming replay overhead in isolation: same commits via
      // the file-source replay harness
      val root2 = java.nio.file.Files
        .createTempDirectory("graft_ivfprof2_").toString + "/ivf"
      phase("ivfReplayVersioned (all)") {
        graft.streaming.Streams.ivfReplayVersioned(
          spark, init, batches, root2, "vec_id", "embedding", cent,
          pqM = 8, pqK = 16, sq8 = true).count()
      }
      phase("destroy2") { IvfIndex.destroy(root2) }
    }
    spark.stop()
  }
}
