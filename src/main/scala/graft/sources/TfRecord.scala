package graft.sources

import java.io.BufferedOutputStream

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord — the TensorFlow training-data container (public wire
  * format, `tensorflow/core/lib/io/record_writer.cc` docs): a flat
  * sequence of frames
  *
  *   uint64  length                  (little-endian)
  *   uint32  masked_crc32c(length)   (of the 8 length bytes)
  *   byte    data[length]
  *   uint32  masked_crc32c(data)
  *
  * with `masked(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8` over
  * uint32 arithmetic. Payloads are opaque bytes here (tf.Example
  * protobuf in the ecosystem — parsing protos is the consumer's job;
  * the CONTAINER is what a corpus pipeline needs to read and emit).
  *
  * Scale shape: TFRecord is NOT splittable (no sync markers, no
  * index), so the ecosystem shards corpora into many files and
  * parallelizes per file — exactly what [[read]] does (Spark's
  * binaryFile source lists + assigns files to tasks; one task decodes
  * one shard sequentially) and what [[write]] emits (one shard per
  * partition). Both CRCs verify on read — corruption fails loudly,
  * never yields truncated/garbage payloads. */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  private[graft] def maskedCrc(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue // uint32 in a long
    val rot = ((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL
    (rot + MaskDelta) & 0xFFFFFFFFL
  }

  /** Decode one shard's bytes into payloads; loud on any framing or
    * checksum violation. */
  private[graft] def decode(bytes: Array[Byte], what: String): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 0
    while (pos < bytes.length) {
      require(bytes.length - pos >= 12,
        s"$what: truncated frame header at offset $pos")
      val len = bb.getLong(pos)
      require(len >= 0 && len <= bytes.length - pos - 16,
        s"$what: frame length $len at offset $pos exceeds shard")
      val lenCrc = bb.getInt(pos + 8).toLong & 0xFFFFFFFFL
      require(maskedCrc(bytes, pos, 8) == lenCrc,
        f"$what: length crc mismatch at offset $pos")
      val data = java.util.Arrays.copyOfRange(bytes, pos + 12,
        pos + 12 + len.toInt)
      val dataCrc = bb.getInt(pos + 12 + len.toInt).toLong & 0xFFFFFFFFL
      require(maskedCrc(data, 0, data.length) == dataCrc,
        f"$what: data crc mismatch at offset $pos")
      out += data
      pos += 12 + len.toInt + 4
    }
    out.toSeq
  }

  private[graft] def encode(payloads: Iterator[Array[Byte]],
                              out: java.io.OutputStream): Unit = {
    payloads.foreach { p =>
      val head = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      head.putLong(p.length.toLong)
      head.putInt(maskedCrc(head.array(), 0, 8).toInt)
      out.write(head.array())
      out.write(p)
      val foot = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      foot.putInt(maskedCrc(p, 0, p.length).toInt)
      out.write(foot.array())
    }
  }

  /** Whole-file gunzip (TF's `compression_type="GZIP"` wraps the whole
    * shard, not individual records). */
  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 1 << 16)
    try in.readAllBytes() finally in.close()
  }

  /** (file, rec_idx, payload BINARY) — one decoding task per shard via
    * the binaryFile source; `.gz` shards gunzip first (TFRecord's GZIP
    * compression wraps the whole file). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val bytes = if (path.endsWith(".gz")) gunzip(content) else content
        decode(bytes, path).iterator.zipWithIndex.map {
          case (p, i) => (path, i.toLong, p) }
      }.toDF("file", "rec_idx", "payload")
  }

  /** One .tfrecord shard per partition of `df` (the ecosystem's
    * sharding convention); `payloadCol` must be BINARY. `gzip = true`
    * writes whole-file-gzipped `.tfrecord.gz` shards (TF's GZIP
    * compression type). Shards write through the Hadoop FileSystem
    * resolved per task ([[FsIo]]) so `file://`, `hdfs://` and `s3a://`
    * targets all work — never executor-local `java.io`. */
  def write(df: DataFrame, payloadCol: String, dir: String,
            gzip: Boolean = false): Unit = {
    val conf = FsIo.snapshot(df.sparkSession)
    FsIo.mkdirs(conf.value, dir) // empty input still yields the directory
    df.select(payloadCol).foreachPartition { (rows: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      if (rows.hasNext) {
        val name = f"part-$pid%05d.tfrecord" + (if (gzip) ".gz" else "")
        val raw = new BufferedOutputStream(
          FsIo.create(conf.value, s"$dir/$name"), 1 << 16)
        val out = if (gzip) new java.util.zip.GZIPOutputStream(raw, 1 << 16)
          else raw
        try encode(rows.map(_.getAs[Array[Byte]](0)), out)
        finally out.close()
      }
    }
  }
}
