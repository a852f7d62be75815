package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC reader/exporter checks. The fixture records are built here byte by
  * byte straight from the ISO 28500 layout (version line, CRLF headers,
  * blank line, Content-Length block, CRLF CRLF terminator) — independent of
  * `Warc.record`, so writer bugs cannot mask reader bugs. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Hand-built record: WARC headers + raw content block. */
  private def rawRecord(warcType: String, uri: String, block: Array[Byte],
                        contentType: String,
                        extraHeader: String = ""): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.1\r\n")
      .append(s"WARC-Type: $warcType\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-0000000000ab>\r\n")
      .append("WARC-Date: 2026-02-03T04:05:06Z\r\n")
    if (uri.nonEmpty) head.append(s"WARC-Target-URI: $uri\r\n")
    if (extraHeader.nonEmpty) head.append(extraHeader)
    head.append(s"Content-Type: $contentType\r\n")
      .append(s"Content-Length: ${block.length}\r\n\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(UTF_8))
    out.write(block)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def httpBlock(body: Array[Byte], ct: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((s"HTTP/1.1 200 OK\r\nServer: t\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8))
    out.write(body)
    out.toByteArray
  }

  private def fixtureBytes(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(rawRecord("warcinfo", "",
      "software: warcspec\r\n".getBytes(UTF_8), "application/warc-fields"))
    out.write(rawRecord("response", "https://a.example.org/x",
      httpBlock("hello warc é世".getBytes(UTF_8), "text/plain; charset=utf-8"),
      "application/http; msgtype=response",
      // continuation line: folded into WARC-Date? No — use a custom header.
      "X-Folded: first\r\n second\r\n"))
    out.write(rawRecord("request", "https://a.example.org/x",
      ("GET /x HTTP/1.1\r\nHost: a.example.org\r\n\r\n").getBytes(UTF_8),
      "application/http; msgtype=request"))
    // binary body with CRLFs inside — Content-Length framing must carry it
    val bin = Array.tabulate[Byte](257)(i => (i % 251).toByte)
    out.write(rawRecord("response", "https://b.example.org/bin",
      httpBlock(bin, "application/octet-stream"),
      "application/http; msgtype=response"))
    out.toByteArray
  }

  test("plain .warc: all record types, headers, http split, binary bodies") {
    val dir = Files.createTempDirectory("warcspec").toFile
    val f = new java.io.File(dir, "fix.warc")
    val fo = new FileOutputStream(f); fo.write(fixtureBytes()); fo.close()

    val rows = Warc.read(spark, f.getPath).collect()
      .map(r => (r.getAs[String]("warc_type"), r)).toMap
    assert(rows.size == 4 || rows.contains("warcinfo")) // 4 records, 3 types + dup response
    val all = Warc.read(spark, f.getPath).orderBy("record_id", "target_uri").collect()
    assert(all.length == 4)

    val info = all.find(_.getAs[String]("warc_type") == "warcinfo").get
    assert(new String(info.getAs[Array[Byte]]("payload"), UTF_8) ==
      "software: warcspec\r\n")
    assert(info.getAs[Any]("http_status") == null)

    val resp = all.filter(r => r.getAs[String]("warc_type") == "response" &&
      r.getAs[String]("target_uri") == "https://a.example.org/x").head
    assert(resp.getAs[Int]("http_status") == 200)
    assert(resp.getAs[String]("http_content_type") == "text/plain; charset=utf-8")
    assert(new String(resp.getAs[Array[Byte]]("payload"), UTF_8) ==
      "hello warc é世")

    val req = all.find(_.getAs[String]("warc_type") == "request").get
    assert(req.getAs[Any]("http_status") == null, "request has no status line")
    assert(new String(req.getAs[Array[Byte]]("payload"), UTF_8).isEmpty,
      "request body after the empty header separator is empty")

    val bin = all.filter(_.getAs[String]("target_uri") == "https://b.example.org/bin").head
    val body = bin.getAs[Array[Byte]]("payload")
    assert(body.length == 257 && body(256) == (256 % 251).toByte)
  }

  test("gzip per-record members (Common Crawl convention) decode as one stream") {
    val dir = Files.createTempDirectory("warcspec").toFile
    val f = new java.io.File(dir, "fix.warc.gz")
    val fo = new FileOutputStream(f)
    // compress EACH record as its own gzip member
    val records = Seq(
      rawRecord("response", "https://m1.example.org/",
        httpBlock("m1".getBytes(UTF_8), "text/plain"),
        "application/http; msgtype=response"),
      rawRecord("response", "https://m2.example.org/",
        httpBlock("m2".getBytes(UTF_8), "text/plain"),
        "application/http; msgtype=response"))
    records.foreach { r =>
      val gz = new GZIPOutputStream(fo); gz.write(r); gz.finish()
    }
    fo.close()
    val got = Warc.read(spark, f.getPath)
      .select("target_uri").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(got.toSeq == Seq("https://m1.example.org/", "https://m2.example.org/"))
  }

  test("truncated content block and missing terminator reject loudly") {
    val dir = Files.createTempDirectory("warcspec").toFile
    val whole = rawRecord("response", "https://t.example.org/",
      httpBlock("0123456789".getBytes(UTF_8), "text/plain"),
      "application/http; msgtype=response")
    val f1 = new java.io.File(dir, "trunc.warc")
    val fo1 = new FileOutputStream(f1)
    fo1.write(whole, 0, whole.length - 20); fo1.close()
    val e1 = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, f1.getPath).collect()
    }
    assert(e1.getMessage != null)

    // bad terminator: overwrite final CRLFCRLF with junk then append EOF
    val bad = whole.clone()
    bad(bad.length - 4) = 'X'
    val f2 = new java.io.File(dir, "badterm.warc")
    val fo2 = new FileOutputStream(f2); fo2.write(bad); fo2.close()
    intercept[org.apache.spark.SparkException] {
      Warc.read(spark, f2.getPath).collect()
    }
  }

  test("exporter round-trip: write response records, read back byte-exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warcspec").resolve("out").toString
    val docs = (0 until 50).map { i =>
      (s"https://src${i % 5}.example.org/doc/$i",
        s"body $i é".getBytes(UTF_8), "text/plain; charset=utf-8")
    }.toDF("uri", "body", "http_content_type").repartition(3)
    Warc.write(docs, dir)
    val back = Warc.read(spark, dir + "/*.warc.gz")
    assert(back.count() == 50)
    val r7 = back.filter(col("target_uri").endsWith("/doc/7")).collect().head
    assert(new String(r7.getAs[Array[Byte]]("payload"), UTF_8) == "body 7 é")
    assert(r7.getAs[Int]("http_status") == 200)
    assert(r7.getAs[String]("warc_date") == "2026-01-01T00:00:00Z")
    // record-id is the deterministic name-UUID of the URI
    val id = java.util.UUID.nameUUIDFromBytes(
      "https://src2.example.org/doc/7".getBytes(UTF_8))
    assert(r7.getAs[String]("record_id") == s"<urn:uuid:$id>")
    // multiple files (one per non-empty partition)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.gz")) >= 2)
  }

  test("header continuation lines fold into the previous header") {
    // X-Folded: first\r\n second  → reader folds; payload untouched.
    // (Verified indirectly: the record with the folded header parses and
    // its payload is intact — a fold bug would desync the header walk.)
    val dir = Files.createTempDirectory("warcspec").toFile
    val f = new java.io.File(dir, "fold.warc")
    val fo = new FileOutputStream(f); fo.write(fixtureBytes()); fo.close()
    val n = Warc.read(spark, f.getPath).count()
    assert(n == 4)
  }
}
