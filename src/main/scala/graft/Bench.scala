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
    val todo = SparkEntry.queries.toSeq.sortBy(_._1) // pinned run order
      .filter(kv => only.forall(_.contains(kv._1)))
    def pass(): Seq[(String, Double)] = todo.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Three passes: the first ("cold") is dominated by per-query Catalyst
    // analysis + whole-stage-codegen compilation (3-4 s of one-time cost on
    // the deepest plans — q_rain_season measured 4.25 s cold vs 1.0 s warm
    // at sf0.1), which made round-over-round per-query deltas mostly
    // JIT/janino noise. The canonical per-query number is the MIN of two
    // warm passes (each re-executes end to end through the noop sink — no
    // caching, data is re-read and re-shuffled; scheduling noise is
    // one-sided additive, so min-of-k estimates the true cost). The cold
    // pass is kept in the JSON so plan-cost regressions stay visible too.
    def toJson(r: Seq[(String, Double)]): String =
      r.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val cold = pass()
    val warm1 = pass().toMap
    val warm2 = pass()
    val warm = warm2.map { case (k, v) => k -> math.min(v, warm1(k)) }
    val line = s"""{"metric":"total","value":${warm.map(_._2).sum},"unit":"sec",""" +
      s""""queries":${toJson(warm)},"mode":"warm-min2",""" +
      s""""total_cold":${cold.map(_._2).sum},"queries_cold":${toJson(cold)},""" +
      s""""sf":"$sfDir"}"""
    println(line)
    // The driver captures stdout with a tail limit, which truncated the
    // per-query map to ~1/3 of the queries in past rounds — so the FULL
    // line is also written to a file (committed per round as
    // bench_full_r{N}.json) for untruncated regression tracking.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { path =>
      val w = new java.io.PrintWriter(path)
      try w.println(line) finally w.close()
    }
    spark.stop()
  }
}
