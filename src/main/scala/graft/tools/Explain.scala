package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time + `explain("formatted")` selected SparkEntry queries.
  * Usage: runMain graft.tools.Explain <sfDir> <q1,q2,...> [--explain]
  * Used for the PLANS.md plan audits each round. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up: JVM/JIT + table page cache
    graft.SparkEntry.queries("q_rolling_mean_7")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (q <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(s"TIMING $q ${(System.nanoTime() - t0) / 1e9}")
      if (doExplain) graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
