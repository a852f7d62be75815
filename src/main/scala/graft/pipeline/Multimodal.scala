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

  /** Stub implementation for NON-image modalities (this container ships no
    * audio/video codecs): deterministic pseudo-features from a rolling
    * hash — the schema, batching, and lifecycle are the real, tested
    * surface. Image decoding has a REAL implementation: [[ImageIODecoder]]. */
  final class FakeDecoder extends MediaDecoder {
    def decode(modality: String, payload: Array[Byte], dims: Int): Array[Float] =
      fakeDecode(payload, dims)
  }

  /** REAL image decoder backed by `javax.imageio` (PNG/BMP/GIF/JPEG readers
    * ship in the JDK — no external codecs needed). Feature layout (first
    * `dims` entries, zero-padded; dims >= 8 recommended):
    *
    *   0: width (px)            4: exact green channel sum
    *   1: height (px)           5: exact blue channel sum
    *   2: raster band count     6: popcount of the 8x8 average-hash
    *   3: exact red channel sum 7: mean luma (BT.601, 0-255)
    *
    * Channel SUMS (0-255 scale integers), not means, are exported: a sum is
    * <= 255·w·h, so for images under ~65k pixels it is exactly representable
    * in Float (< 2^24) and an external SQL oracle reproduces it in exact
    * integer arithmetic — the property the decode oracle query relies on.
    * Entry 6 is the perceptual average-hash (aHash) bit count: luma is
    * block-averaged onto an 8x8 grid and each cell is thresholded at the
    * global mean — near-duplicate images land within a few bits.
    *
    * Non-image modalities and undecodable payloads return null features
    * (n_bytes survives for triage). Decoding is pure CPU per row; the
    * per-partition open() disables ImageIO's temp-file cache once. */
  final class ImageIODecoder extends MediaDecoder {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    def decode(modality: String, payload: Array[Byte], dims: Int): Array[Float] = {
      if (payload == null || modality != "image") return null
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var lumaSum = 0.0
      val cellLuma = new Array[Double](64)
      val cellN = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val lum = (299 * r + 587 * g + 114 * b) / 1000.0
          lumaSum += lum
          val cell = cy * 8 + x * 8 / w
          cellLuma(cell) += lum; cellN(cell) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val meanLuma = lumaSum / n
      var pop = 0
      var c = 0
      while (c < 64) {
        if (cellN(c) > 0 && cellLuma(c) / cellN(c) > meanLuma) pop += 1
        c += 1
      }
      val out = new Array[Float](dims)
      val feats = Array[Float](w.toFloat, h.toFloat,
        img.getRaster.getNumBands.toFloat, sr.toFloat, sg.toFloat, sb.toFloat,
        pop.toFloat, meanLuma.toFloat)
      System.arraycopy(feats, 0, out, 0, math.min(dims, feats.length))
      out
    }
  }

  /** Deterministic planted RGB image, PNG-encoded (lossless — decode
    * returns the exact pixels): channel c of pixel (x, y) is
    * `(id·7 + x·3 + y·5 + c·11) mod 256`, a closed form any SQL engine
    * reproduces with integer arithmetic. Generate → encode → [[ImageIODecoder]]
    * → exact channel sums is therefore an end-to-end oracle-checkable
    * decode path. */
  def plantedPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = id * 7 + x * 3 + y * 5
        val r = (base % 256).toInt
        val g = ((base + 11) % 256).toInt
        val b = ((base + 22) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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

  /** Default decoder: REAL ImageIO decode for images; deterministic stub
    * for audio/video (the JDK ships no audio/video codecs — a JNI/FFI
    * implementation drops into the same seam). */
  final class DefaultDecoder extends MediaDecoder {
    private val img = new ImageIODecoder
    private val other = new FakeDecoder
    override def open(): Unit = { img.open(); other.open() }
    override def close(): Unit = { img.close(); other.close() }
    def decode(modality: String, payload: Array[Byte], dims: Int): Array[Float] =
      if (modality == "image") img.decode(modality, payload, dims)
      else other.decode(modality, payload, dims)
  }

  /** Feature extraction as a narrow per-partition batch kernel (mapInPandas
    * twin): no shuffle, binary column dropped from the output schema. The
    * decoder factory runs once per partition (open/close lifecycle); swap
    * in a JNI-backed [[MediaDecoder]] without touching the plan. */
  def extractFeatures(media: DataFrame, dims: Int = 8,
                      decoder: () => MediaDecoder = () => new DefaultDecoder): DataFrame = {
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
