package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque `BINARY` columns with typed
  * metadata; decode/feature steps run as `mapPartitions` batch kernels —
  * the Scala twin of `mapInPandas` — so a real decoder (JNI/FFI to an image
  * or audio library) drops into `decodeBatch` without touching the plan.
  *
  * Scale design:
  *  - Media bytes NEVER enter a shuffle: feature extraction projects the
  *    binary column away before any wide transformation, and the narrow
  *    `mapPartitions` stage preserves the scan partitioning.
  *  - `spark.sql.files.maxPartitionBytes` governs batch size; with ~1 MB
  *    media rows, 128 MB scan partitions yield ~128-row decode batches,
  *    matching typical accelerator batch shapes.
  *  - The decoder is a per-partition closure: model/codec initialisation
  *    happens once per partition, not per row (the mapInPandas batch
  *    contract).
  *
  * The decode step itself is STUBBED deterministically (this container has
  * no media codecs): `fakeDecode` derives a stable pseudo-feature vector
  * from the payload hash. The schema, batching, and partition behavior are
  * the real, tested surface.
  */
object Multimodal {

  /** Canonical media-row schema: content-addressed id, modality tag, raw
    * payload, and sidecar metadata (the parquet layout for a media lake). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),   // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** The decoder seam: a per-partition-lifecycle codec interface. A real
    * implementation wraps a JNI/FFI library (libjpeg/ffmpeg/ONNX runtime):
    * `open()` acquires the native handle once per partition, `decode()`
    * runs per row, `close()` releases. Implementations are plain classes —
    * the FACTORY closure ships to executors inside the task closure, so no
    * driver-side registry needs to exist on the worker JVM. */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(modality: String, payload: Array[Byte], dims: Int): Array[Float]
    def close(): Unit = ()
  }

  /** Default stub implementation (this container ships no media codecs):
    * deterministic pseudo-features from a rolling hash — the schema,
    * batching, and lifecycle are the real, tested surface. */
  final class FakeDecoder extends MediaDecoder {
    def decode(modality: String, payload: Array[Byte], dims: Int): Array[Float] =
      fakeDecode(payload, dims)
  }

  /** STUB decoder kernel used by [[FakeDecoder]]: a real implementation
    * would decode the payload and run a feature extractor; here the feature
    * is a deterministic 8-dim vector derived from a rolling hash of the
    * bytes, so tests exercise the exact batch shapes and schemas a real
    * decoder would see. */
  def fakeDecode(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    if (payload == null) return null
    val out = new Array[Float](dims)
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % dims) += (h & 0xffff) / 65535.0f
      i += 1
    }
    out
  }

  /** Feature extraction as a narrow per-partition batch kernel (mapInPandas
    * twin): no shuffle, binary column dropped from the output schema. The
    * decoder factory runs once per partition (open/close lifecycle); swap
    * in a JNI-backed [[MediaDecoder]] without touching the plan. */
  def extractFeatures(media: DataFrame, dims: Int = 8,
                      decoder: () => MediaDecoder = () => new FakeDecoder): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "modality", "payload").mapPartitions { rows =>
      // per-partition init: codec/model handle acquired once, closed when
      // the partition iterator drains
      val dec = decoder(); dec.open()
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = rows.hasNext; if (!h) dec.close(); h
        }
        def next(): Row = {
          val r = rows.next()
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
            if (payload == null) 0L else payload.length.toLong,
            dec.decode(r.getAs[String]("modality"), payload, dims))
        }
      }
    }(enc)
  }

  /** Frame-sampling plan for video-like payloads: one row per sampled frame
    * index (explode is the plan; actual frame decode is the stub). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .withColumn("frame_ms", explode(sequence(lit(0L),
        greatest(coalesce(col("duration_ms"), lit(0L)) - 1, lit(0L)), lit(everyMs))))
      .drop("payload") // frames would be re-read by offset, never shuffled

  /** Resize/transcode task descriptor: a deterministic plan over metadata
    * only — the byte-level work is executor-side in the decode kernel. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide.toDouble) / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
}
