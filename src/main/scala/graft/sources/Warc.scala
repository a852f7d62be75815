package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException,
  InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader + exporter — the container format
  * web-scale training corpora actually arrive in (Common Crawl publishes
  * ~100 TB/crawl as `*.warc.gz`). The reference has no web-ingest surface;
  * this is part of the LLM-pipeline source tier alongside
  * [[NetCDF]]/[[Hdf5]]/[[Zarr]].
  *
  * Format parsed from the public ISO 28500 / WARC 1.1 specification: each
  * record is `WARC/1.x CRLF  header-lines CRLF  CRLF  content-block
  * (Content-Length bytes)  CRLF CRLF`. Common Crawl convention compresses
  * each record as its OWN gzip member, concatenated — `GZIPInputStream`
  * decodes concatenated members transparently, so one sequential pass
  * decodes the whole file. For `WARC-Type: response|request` records whose
  * Content-Type is `application/http`, the content block is an HTTP/1.1
  * message; the status line and headers are split off and the payload is
  * the entity body.
  *
  * Scale design: gzip members are not block-splittable, so the unit of
  * parallelism is the FILE — exactly how Common Crawl shards (64k files ×
  * ~1 GB per crawl). `read` uses `sparkContext.binaryFiles`'
  * `PortableDataStream`, so each task STREAMS its file (constant memory in
  * file size; per-record buffers only — records are capped at
  * [[MaxRecordBytes]] and reject loudly beyond it). No driver-side reads.
  * The exporter writes one `.warc.gz` per partition from
  * `foreachPartition`, record-per-member so downstream readers can
  * re-shard by member without re-compressing.
  *
  * Malformed input (bad magic, missing Content-Length, truncated content,
  * missing record terminator) throws with byte offsets rather than
  * returning partial rows — silent corruption is worse than a failed task.
  */
object Warc {

  /** Hard cap on one record's content block (256 MiB) — a corrupt
    * Content-Length otherwise asks for a multi-GB allocation. */
  val MaxRecordBytes: Int = 256 << 20

  final case class WarcRow(
      file: String,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      payload: Array[Byte])

  // ---------------------------------------------------------------- read

  /** Read `*.warc` / `*.warc.gz` files under `path` (glob ok) into a
    * DataFrame, one row per WARC record. `minPartitions` seeds the file
    * grouping only; at lake scale there are far more files than tasks. */
  def read(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(path, mp).flatMap { case (file, pds) =>
      val raw = new BufferedInputStream(pds.open(), 1 << 16)
      val in = if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
      recordIterator(file, new CountingStream(in))
    }.toDF()
  }

  /** Streaming record iterator: pulls one record per `next()`, closes the
    * stream at EOF. hasNext peeks exactly one byte to distinguish clean
    * EOF from a truncated record. */
  private def recordIterator(file: String, in: CountingStream): Iterator[WarcRow] =
    new Iterator[WarcRow] {
      private var peeked: Int = -2 // -2 = nothing peeked
      def hasNext: Boolean = {
        if (peeked == -2) {
          peeked = in.read()
          if (peeked == -1) in.close()
        }
        peeked != -1
      }
      def next(): WarcRow = {
        if (!hasNext) throw new NoSuchElementException
        val first = peeked.toChar
        peeked = -2
        parseRecord(file, in, first)
      }
    }

  private def parseRecord(file: String, in: CountingStream, first: Char): WarcRow = {
    val at = in.count
    val version = first + readLine(in, file)
    if (!version.startsWith("WARC/"))
      fail(file, at, s"expected WARC/1.x record header, got '${version.take(20)}'")
    val headers = readHeaders(in, file)
    def h(name: String): Option[String] = headers.get(name.toLowerCase)
    val len = h("Content-Length").map(_.trim.toLong).getOrElse(
      fail(file, at, "record has no Content-Length"))
    if (len < 0 || len > MaxRecordBytes)
      fail(file, at, s"unreasonable Content-Length $len")
    val block = readExactly(in, len.toInt, file)
    // record terminator: CRLF CRLF
    expectCrlf(in, file); expectCrlf(in, file)

    val warcType = h("WARC-Type").getOrElse("")
    val cType = h("Content-Type").getOrElse("")
    val isHttp = (warcType == "response" || warcType == "request") &&
      cType.toLowerCase.startsWith("application/http")
    val (status, httpCt, payload) =
      if (isHttp) parseHttp(block, file, at) else (None, None, block)
    WarcRow(file, warcType, h("WARC-Record-ID").getOrElse(""),
      h("WARC-Target-URI").getOrElse(""), h("WARC-Date").getOrElse(""),
      cType, len, status, httpCt, payload)
  }

  /** Split an application/http content block into (status, content-type,
    * body). Request records have no status line → status None. */
  private def parseHttp(block: Array[Byte], file: String, at: Long)
      : (Option[Int], Option[String], Array[Byte]) = {
    val sep = indexOfDoubleCrlf(block)
    if (sep < 0) fail(file, at, "http block has no header/body separator")
    val head = new String(block, 0, sep, UTF_8)
    val body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    val lines = head.split("\r\n")
    val status = lines.headOption.filter(_.startsWith("HTTP/")).flatMap {
      _.split(" ").lift(1).flatMap(s => scala.util.Try(s.toInt).toOption)
    }
    val ct = lines.iterator.drop(1).map(_.split(":", 2))
      .collectFirst { case Array(k, v) if k.equalsIgnoreCase("content-type") => v.trim }
    (status, ct, body)
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Header lines until the blank separator; names lowercased. WARC allows
    * continuation lines (leading SP/HT) — folded into the previous value. */
  private def readHeaders(in: CountingStream, file: String): Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    var line = readLine(in, file)
    while (line.nonEmpty) {
      if ((line.head == ' ' || line.head == '\t') && last != null)
        m(last) = m(last) + " " + line.trim
      else line.split(":", 2) match {
        case Array(k, v) => last = k.trim.toLowerCase; m(last) = v.trim
        case _ => fail(file, in.count, s"malformed header line '${line.take(40)}'")
      }
      line = readLine(in, file)
    }
    m.toMap
  }

  /** One CRLF-terminated line as a String (header section is ASCII per
    * spec; bytes are decoded UTF-8 to be lenient about URIs). */
  private def readLine(in: InputStream, file: String): String = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var c = in.read()
    while (c != -1 && c != '\n') { buf.write(c); c = in.read() }
    if (c == -1) throw new EOFException(s"$file: EOF inside record header")
    val b = buf.toByteArray
    val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
    new String(b, 0, n, UTF_8)
  }

  private def readExactly(in: InputStream, n: Int, file: String): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n - off)
      if (r < 0) throw new EOFException(
        s"$file: EOF inside content block ($off of $n bytes)")
      off += r
    }
    out
  }

  private def expectCrlf(in: CountingStream, file: String): Unit = {
    val a = in.read(); val b = in.read()
    if (a != '\r' || b != '\n')
      fail(file, in.count, s"missing CRLF record terminator (got $a $b)")
  }

  private def fail(file: String, at: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"$file @$at: $msg")

  /** Decompressed-byte counter for error offsets. */
  private final class CountingStream(under: InputStream) extends InputStream {
    var count: Long = 0L
    override def read(): Int = {
      val r = under.read(); if (r >= 0) count += 1; r
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = under.read(b, off, len); if (r > 0) count += r; r
    }
    override def close(): Unit = under.close()
  }

  // --------------------------------------------------------------- write

  /** Export `df` as WARC response records, one `.warc.gz` file per
    * partition, one gzip member per record (the Common Crawl sharding, so
    * readers re-parallelise per member). Expected columns: `uri` STRING,
    * `body` BINARY, `http_content_type` STRING. Deterministic metadata:
    * WARC-Record-ID is the name-UUID of the URI, WARC-Date is the fixed
    * `date` argument — exporters of derived corpora want reproducible
    * bytes, not wall-clock stamps. The caller owns directory lifecycle
    * (fresh or overwrite-able path). Shards write through the Hadoop
    * FileSystem resolved per task ([[FsIo]]) so `file://`, `hdfs://`
    * and `s3a://` targets all work — never executor-local `java.io`. */
  def write(df: DataFrame, dir: String,
            date: String = "2026-01-01T00:00:00Z"): Unit = {
    val conf = FsIo.snapshot(df.sparkSession)
    FsIo.mkdirs(conf.value, dir)
    df.select("uri", "body", "http_content_type").foreachPartition {
      (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        if (rows.hasNext) {
          val out = new BufferedOutputStream(
            FsIo.create(conf.value, dir + f"/part-$pid%05d.warc.gz"), 1 << 16)
          // ONE native Deflater reused across all members: a fresh
          // GZIPOutputStream per record costs a native deflater
          // init/leak per record (measured 16× slower on a 300k-record
          // export) — member framing is 18 bytes of static header/trailer
          // we write ourselves
          val defl = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try rows.foreach { r =>
            gzipMember(record(r.getString(0), r.getAs[Array[Byte]](1),
              r.getString(2), date), defl, out)
          } finally { defl.end(); out.close() }
        }
    }
  }

  private val GzipHeader: Array[Byte] =
    Array(0x1f, 0x8b, 8, 0, 0, 0, 0, 0, 0, 0xff).map(_.toByte)

  /** One complete gzip member (RFC 1952 framing) via a reused Deflater. */
  private def gzipMember(bytes: Array[Byte], defl: java.util.zip.Deflater,
                         out: java.io.OutputStream): Unit = {
    out.write(GzipHeader)
    defl.reset()
    defl.setInput(bytes)
    defl.finish()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    writeIntLE(out, crc.getValue.toInt)
    writeIntLE(out, bytes.length)
  }

  private def writeIntLE(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** One response record's bytes (WARC headers + HTTP wrapper + body). */
  private[sources] def record(uri: String, body: Array[Byte],
                              contentType: String, date: String): Array[Byte] = {
    val id = java.util.UUID.nameUUIDFromBytes(uri.getBytes(UTF_8))
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    val head = (s"WARC/1.1\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(UTF_8)
    val out = new java.io.ByteArrayOutputStream(
      head.length + http.length + body.length + 4)
    out.write(head); out.write(http); out.write(body)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }
}
