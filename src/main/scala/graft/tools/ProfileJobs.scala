package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool (r17 optimization round): per-Spark-job wall-clock breakdown of
  * one SparkEntry query — shows where a multi-commit fixture spends its
  * time (metadata collects, segment writes, probes, streaming machinery).
  * Usage: runMain graft.tools.ProfileJobs <sfDir> <q1,q2,...>
  * Prints one line per job: PROFILE <query> <jobId> <seconds> <callsite>. */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var current = "warmup"
    val sb = new StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("callSite.short")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          sb.synchronized {
            sb.append(f"PROFILE $current%s job=${j.jobId}%d " +
              f"${(System.nanoTime() - t0) / 1e9}%.3f $site%s\n")
          }
        }
    })
    // warm-up: JVM/JIT + table page cache
    graft.SparkEntry.queries("q_rolling_mean_7")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    sb.synchronized(sb.clear())
    for (q <- names; p <- 1 to 2) { // pass 2 = warm (the bench's number)
      current = s"$q#$p"
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      sb.synchronized {
        sb.append(f"PROFILE-TOTAL $q%s pass=$p%d " +
          f"${(System.nanoTime() - t0) / 1e9}%.3f\n")
      }
    }
    Thread.sleep(500) // let trailing job-end events drain
    print(sb.synchronized(sb.toString))
    spark.stop()
  }
}
