package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall-clock seconds.
  * Queries are materialised through the `noop` sink so every output column
  * is actually computed (a bare `count()` lets Catalyst prune the
  * projections being measured). A warm-up pass touches each table once so
  * the first measured query isn't charged JVM/JIT/page-cache startup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("lineitem", "orders", "customer", "documents", "embeddings").foreach { tb =>
      try graft.sources.Tables.table(spark, sfDir, tb).count()
      catch { case _: Throwable => }
    }
    try graft.sources.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => }

    // optional comma-separated query filter for targeted scale rehearsals
    // (dev only — the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
