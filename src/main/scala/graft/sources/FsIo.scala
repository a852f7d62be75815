package graft.sources

import java.io.OutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem write plumbing shared by the export sinks
  * (TFRecord / WARC / Zarr / NetCDF reverse). An executor-side
  * `java.io.FileOutputStream` against a driver-supplied path is correct
  * only when every executor sees the same mount (local mode, NFS); on a
  * real cluster with `hdfs://`/`s3a://` storage the same code silently
  * scatters shards across machines' local disks. Routing every sink
  * through `org.apache.hadoop.fs.FileSystem` makes `file://`, `hdfs://`
  * and `s3a://` uniform — the scheme picks the implementation, and a
  * scheme-less path resolves against `fs.defaultFS` exactly like every
  * stock Spark source.
  *
  * Two deliberate choices:
  *   - `Configuration` is not `Serializable`, and executors have no
  *     `SparkContext`, so the driver captures the session's Hadoop conf
  *     into a [[ConfSnapshot]] (plain key/value pairs) that task
  *     closures rebuild lazily — the same conf-shipping move Spark's own
  *     `SerializableConfiguration` makes, without reaching into a
  *     `private[spark]` class.
  *   - local writes unwrap [[ChecksumFileSystem]] to its raw form:
  *     export stores are self-describing directory formats (Zarr keys,
  *     TFRecord shards) and `.{name}.crc` sidecars are pure noise there;
  *     remote filesystems (HDFS/S3A) checksum internally and pass
  *     through untouched.
  */
object FsIo {

  /** Serializable snapshot of a Hadoop configuration; rebuilt lazily
    * once per task closure via [[value]]. */
  final class ConfSnapshot private[FsIo] (entries: Array[(String, String)])
      extends Serializable {
    @transient lazy val value: Configuration = {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
  }

  /** Capture the session's Hadoop configuration for shipping into task
    * closures. Driver-side only. */
  def snapshot(spark: SparkSession): ConfSnapshot = {
    val conf = spark.sparkContext.hadoopConfiguration
    val it = conf.iterator()
    val buf = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    new ConfSnapshot(buf.result())
  }

  /** The path's FileSystem, with local checksum wrapping removed. */
  def fs(conf: Configuration, path: String): FileSystem =
    new Path(path).getFileSystem(conf) match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case other                 => other
    }

  /** Create (overwrite) `path`; parent directories are created
    * automatically (the Hadoop `create` contract). */
  def create(conf: Configuration, path: String): OutputStream = {
    val p = new Path(path)
    fs(conf, path).create(p, true)
  }

  /** One-shot small-file write (metadata documents, planted keys). */
  def writeBytes(conf: Configuration, path: String, bytes: Array[Byte]): Unit = {
    val out = create(conf, path)
    try out.write(bytes) finally out.close()
  }

  /** One-shot small-file read — the read half [[Zarr.consolidate]]-style
    * metadata passes need when the store is remote. */
  def readBytes(conf: Configuration, path: String): Array[Byte] = {
    val in = fs(conf, path).open(new Path(path))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  def mkdirs(conf: Configuration, path: String): Unit = {
    fs(conf, path).mkdirs(new Path(path))
  }

  def exists(conf: Configuration, path: String): Boolean =
    fs(conf, path).exists(new Path(path))

  /** Immediate child directory names of `path`, sorted — the lake /
    * store discovery listing (one level, never recursive). */
  def listDirNames(conf: Configuration, path: String): Seq[String] =
    fs(conf, path).listStatus(new Path(path))
      .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq

  /** Recursive file listing (paths as strings); empty for absent dirs. */
  def listFilesRecursive(conf: Configuration, path: String): Seq[String] = {
    val f = fs(conf, path)
    val p = new Path(path)
    if (!f.exists(p)) Nil
    else {
      val out = Seq.newBuilder[String]
      val it = f.listFiles(p, true)
      while (it.hasNext) out += it.next().getPath.toString
      out.result()
    }
  }

  def delete(conf: Configuration, path: String): Unit = {
    val f = fs(conf, path)
    val p = new Path(path)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Atomic replace of `dst` by `src` — the pointer-swap primitive.
    * `FileContext.rename(OVERWRITE)` is atomic on POSIX and HDFS; on an
    * object store it is copy+delete and deployments must swap through a
    * conditional PUT / transaction-log append instead (the same caveat
    * `lake-info` surfaces for the versioned lake). */
  def atomicReplace(conf: Configuration, src: String, dst: String): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(dst).toUri, conf)
    fc.rename(new Path(src), new Path(dst),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Loud guard for seek-write formats (NetCDF classic): random-access
    * writes exist only on POSIX filesystems — HDFS is append-only and
    * object stores have no partial PUT — so a non-local target must be
    * rejected, not silently scattered. Returns the plain local path
    * (scheme stripped) for `RandomAccessFile`. */
  def requireLocalPath(conf: Configuration, path: String, what: String): String = {
    val p = new Path(path)
    // scheme check BEFORE FileSystem.get — instantiating e.g. a DFS
    // client resolves hosts and would bury the real complaint
    val scheme = Option(p.toUri.getScheme)
      .orElse(Option(new Path(conf.get("fs.defaultFS", "file:///")).toUri.getScheme))
      .getOrElse("file")
    require(scheme == "file",
      s"$what requires a locally-mounted (POSIX) target: random-access " +
        s"writes cannot run against $scheme:// storage. Export " +
        "to Zarr (whole-chunk objects) for distributed stores.")
    val uriPath = p.toUri.getPath
    if (uriPath == null || uriPath.isEmpty) path else uriPath
  }
}
