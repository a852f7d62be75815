package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interchange-format round-trips (JSONL / CSV / ORC) and the partitioned
  * lake layout: every write-read pair must return the source rows
  * VALUE-IDENTICAL (not just count-identical), and a partition-column
  * filter must prune the file listing — the property that turns a
  * per-language pass over a partitioned 100 TB corpus into a scan of just
  * that language's directories. */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.sources.Tables.table(spark, sfDir, "documents")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fmt_$tag").toString

  /** Canonical row images, order-free. */
  private def image(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .collect()
      .map(r => (0 until 5).map(i => String.valueOf(r.get(i))).mkString(""))
      .toSet

  test("JSONL round-trip is value-identical under the source schema") {
    val d = docs
    val path = tmp("jsonl")
    d.write.mode("overwrite").json(path)
    val back = spark.read.schema(d.schema).json(path)
    assert(image(back) == image(d))
  }

  test("CSV round-trip is value-identical under the source schema") {
    val d = docs
    val path = tmp("csv")
    d.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.schema(d.schema).option("header", "true").csv(path)
    assert(image(back) == image(d))
  }

  test("ORC round-trip is value-identical") {
    val d = docs
    val path = tmp("orc")
    d.write.mode("overwrite").orc(path)
    assert(image(spark.read.orc(path)) == image(d))
  }

  test("partitioned lake write prunes the scan to the filtered languages") {
    val d = docs
    val nLangs = d.select("lang").distinct().count()
    assert(nLangs > 2, s"fixture needs >2 languages, found $nLangs")
    val path = tmp("lakepart")
    d.write.mode("overwrite").partitionBy("lang").parquet(path)
    val pruned = spark.read.parquet(path)
      .filter(col("lang").isin("en", "zh"))
    // the scan node must carry the partition filter and list exactly the
    // two matching directories
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "lang filter must reach the scan as a partition filter")
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned partitions, scanned " +
        s"${scan.selectedPartitions.partitionCount}")
    // and the partition column reconstitutes losslessly
    assert(image(pruned) ==
      image(d.filter(col("lang").isin("en", "zh"))))
  }
}
