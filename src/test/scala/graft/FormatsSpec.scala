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

  test("TFRecord: masked crc pins to the public CRC-32C check vector; corruption loud") {
    import graft.sources.TfRecord
    // crc32c("123456789") = 0xE3069283 (the published CRC-32C check
    // value) — masking per the TFRecord spec pins OUR crc+mask chain
    // against an external vector, not a self-round-trip
    val crc = 0xE3069283L
    val expect = ((((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL) + 0xa282ead8L) & 0xFFFFFFFFL
    assert(TfRecord.maskedCrc("123456789".getBytes("UTF-8"), 0, 9) === expect)
    // frame round trip incl. empty payloads
    val payloads = Seq("".getBytes, "abc".getBytes, ("x" * 5000).getBytes)
    val bos = new java.io.ByteArrayOutputStream()
    TfRecord.encode(payloads.iterator, bos)
    val bytes = bos.toByteArray
    assert(TfRecord.decode(bytes, "t").map(new String(_)) ===
      payloads.map(new String(_)))
    // one flipped payload byte -> loud, never truncated/garbage output
    val bad = bytes.clone(); bad(12 + 0 + 4 + 12) = 'Z'.toByte
    intercept[IllegalArgumentException](TfRecord.decode(bad, "t"))
    // truncated tail -> loud
    intercept[IllegalArgumentException](
      TfRecord.decode(java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 2), "t"))
  }

  test("TFRecord shards round-trip through executors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_tfr_").toString
    val df = (1 to 5000).map(i => (i.toLong, s"payload-$i" * (i % 7 + 1)))
      .toDF("id", "s")
    graft.sources.TfRecord.write(
      df.select(col("s").cast("binary").as("p")).repartition(6), "p", dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tfrecord")) == 6)
    val back = graft.sources.TfRecord.read(spark, dir + "/*.tfrecord")
      .select(col("payload").cast("string")).as[String].collect().sorted
    assert(back.toSeq === df.select("s").as[String].collect().sorted.toSeq)
    // GZIP compression type: whole-file gzip, same records back
    val gzDir = java.nio.file.Files.createTempDirectory("graft_tfrgz_").toString
    graft.sources.TfRecord.write(
      df.select(col("s").cast("binary").as("p")).repartition(3), "p",
      gzDir, gzip = true)
    assert(new java.io.File(gzDir).listFiles()
      .count(_.getName.endsWith(".tfrecord.gz")) == 3)
    val backGz = graft.sources.TfRecord.read(spark, gzDir + "/*.tfrecord.gz")
      .select(col("payload").cast("string")).as[String].collect().sorted
    assert(backGz.toSeq === back.toSeq)
  }
}
