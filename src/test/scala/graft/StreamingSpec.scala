package graft

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Ev}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming behavior: stateful sessionization across
  * micro-batches, and SQL registration of the native expressions. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flatMapGroupsWithState sessions close across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = StatefulSessions.sessionize(input.toDS(), gapMicros = 60L * 1000000)
    val q = sessions.writeStream
      .format("memory").queryName("closed_sessions").outputMode("append").start()
    try {
      // batch 1: three events within the gap -> session stays open
      input.addData(Ev(1, 0), Ev(1, 10000000), Ev(1, 20000000))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0)
      // batch 2: an event far beyond the gap closes the first session
      input.addData(Ev(1, 3600L * 1000000))
      q.processAllAvailable()
      val closed = spark.table("closed_sessions").as[ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed.head.nEvents == 3)
      assert(closed.head.durationMicros == 20000000)
    } finally q.stop()
  }

  test("native expressions usable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "select simhash64(array('spark','engine')) sh, gamma_cdf(2.0, 1.0) g, probit(0.975) p")
      .head
    assert(r.getLong(0) != 0L)
    assert(math.abs(r.getDouble(1) - (1 - math.exp(-2.0))) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.959963984540054) < 1e-8)
    val r2 = spark.sql(
      "select log_gamma(5.0) lg, gamma_ppf(0.5, 1.0) gp, " +
        "minhash_sig(array(1L, 2L, 3L), 4) mh, utci_offset(20.0, 2.0, 1.0, 1.5) u")
      .head
    assert(math.abs(r2.getDouble(0) - math.log(24.0)) < 1e-10)
    assert(math.abs(r2.getDouble(1) - math.log(2.0)) < 1e-9) // exp(1) median
    assert(r2.getSeq[Long](2).length == 4)
    assert(r2.getDouble(3) > 15.0 && r2.getDouble(3) < 30.0)
  }
}
