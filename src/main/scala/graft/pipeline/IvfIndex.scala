package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.FsIo

/** INCREMENTALLY-maintained IVF (inverted-file) ANN index — the
  * similarity-search twin of [[graft.sources.ZOrderLake]]: a one-shot
  * [[Similarity.ivfTopK]] recomputes centroids and assignments per
  * query, which decays the moment a stream appends; re-clustering the
  * corpus per batch is O(corpus). This index keeps ingest O(batch) the
  * way FAISS/Milvus-style systems do — LSM segments:
  *
  *   - CENTROIDS are PINNED at [[init]] (stored under `root/_centroids`):
  *     an assignment is only stable if the centroid it was made against
  *     never moves — the same reason the z-order lake pins its grid
  *     bounds. Re-centering is a rebuild, not maintenance.
  *   - each batch ASSIGNS against the pinned centroids — a broadcast
  *     pure projection (arg-min over an array of (d2, list) structs; no
  *     shuffle per row, no per-id window) — and lands as ONE new
  *     immutable SEGMENT under `root/seg/sNNNNN/`, hash-repartitioned
  *     and `partitionBy("list")` so every (segment, list) posting list
  *     is its own directory. Existing segments are never touched:
  *     per-batch cost is O(batch) however large the corpus grows.
  *   - a manifest file per version lists the live segment dirs;
  *     `_current` (atomic rename swap) carries `version lastBatch` —
  *     the batchId gate makes replays no-ops (appends are not
  *     idempotent), the same exactly-once contract as the z-order and
  *     versioned lakes. Crash between write and swap leaves an orphan
  *     segment the next GC sweeps.
  *   - [[probeTopK]] reads ONLY `seg/sNNNNN/list=K` directories for the
  *     nprobe nearest lists — directory pruning, no file stats needed;
  *     probe cost ≈ (nprobe/nlists) × corpus, independent of how the
  *     corpus arrived. Scoring rides the integer-grid cosine
  *     ([[Similarity.cosineQuantized]]) so ranks are exact.
  *   - DELETES ([[applyDeleteBatch]] — decontamination, opt-out
  *     removal) land as tiny TOMBSTONE segments; visibility follows
  *     LSM sequence order (a tombstone kills only postings committed
  *     before it, so later re-inserts are live), and no posting
  *     segment is touched.
  *   - [[compact]] merges every live segment into one (probe cost is
  *     linear in segment count; compaction amortizes it) and applies
  *     tombstones physically, through the same manifest + pointer
  *     swap — a maintenance version, lastBatch unchanged.
  *
  * Reference anchor: the reference has no ANN surface; this is the
  * LLM-pipeline tier's embedding index (SURVEY §2 pipeline ops), the
  * public IVF design (Jégou et al., PAMI 2011) re-expressed as Spark
  * segments. */
object IvfIndex {

  final case class Pointer(version: Int, lastBatch: Long)

  // ---- metadata (all through FsIo: file://, hdfs://, s3a:// roots) ----

  def readPointer(root: String,
                  conf: Configuration = new Configuration()): Option[Pointer] = {
    val p = s"$root/_current"
    if (!FsIo.exists(conf, p)) None
    else {
      val parts = new String(FsIo.readBytes(conf, p),
        StandardCharsets.UTF_8).trim.split("\\s+")
      require(parts.length == 2, s"corrupt pointer file $p")
      Some(Pointer(parts(0).toInt, parts(1).toLong))
    }
  }

  private def writePointer(root: String, p: Pointer,
                           conf: Configuration): Unit = {
    val tmp = s"$root/_current_${ProcessHandle.current().pid()}.tmp"
    FsIo.writeBytes(conf, tmp,
      s"${p.version} ${p.lastBatch}".getBytes(StandardCharsets.UTF_8))
    FsIo.atomicReplace(conf, tmp, s"$root/_current")
  }

  private def manifestPath(root: String, version: Int) =
    f"$root/_manifests/v$version%05d"

  /** One live segment: `dir`, the version it was committed at (the LSM
    * sequence number — a tombstone kills only postings committed
    * BEFORE it), and whether it is a tombstone (vec_id-only delete)
    * segment. */
  final case class Seg(dir: String, version: Int, tombstone: Boolean)

  private def writeManifest(root: String, version: Int, segs: Seq[Seg],
                            conf: Configuration): Unit =
    FsIo.writeBytes(conf, manifestPath(root, version),
      segs.map(e => s"${if (e.tombstone) "T" else "P"}\t${e.version}\t${e.dir}")
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  /** Live segments of `version`, oldest first. */
  def readManifest(root: String, version: Int,
                   conf: Configuration = new Configuration()): Seq[Seg] = {
    val p = manifestPath(root, version)
    require(FsIo.exists(conf, p), s"missing manifest v$version under $root")
    new String(FsIo.readBytes(conf, p), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq.map { line =>
        val f = line.split("\t")
        Seg(f(2), f(1).toInt, f(0) == "T")
      }
  }

  /** The pinned centroid table (list INT, cvec ARRAY<DOUBLE>). */
  def readCentroids(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/_centroids")

  // ---- assignment (broadcast pure projection, shared with ivfTopK) ----

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
      (x.cast("double") - y.cast("double"))), lit(0.0), (acc, v) => acc + v)

  /** (vec_id, list, embedding) under the PINNED centroids: all centroids
    * pack into one broadcast row; per-row arg-min over (d2, list)
    * structs (ties break toward the smaller list id, matching the
    * oracle's `order by d2, list`). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame = {
    val packed = centroids.agg(
      collect_list(struct(col("list"), col("cvec"))).as("cents"))
    df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .crossJoin(broadcast(packed))
      .withColumn("list",
        array_min(transform(col("cents"),
          c => struct(dist2(col("embedding"), c.getField("cvec")).as("d2"),
            c.getField("list").as("list")))).getField("list"))
      .select(col("vec_id"), col("list"), col("embedding"))
  }

  private def segDir(root: String, version: Int) = f"$root/seg/s$version%05d"
  private def delDir(root: String, version: Int) = f"$root/del/d$version%05d"

  /** One immutable segment: a batch-sized hash shuffle on `list`, then
    * one directory per posting list. */
  private def writeSegment(assigned: DataFrame, dir: String): Unit =
    assigned.repartition(col("list"))
      .write.mode(SaveMode.Overwrite).partitionBy("list").parquet(dir)

  /** Initialize: pin the centroids, write segment 0 from `emb`. The
    * centroid table must be (list, cvec) with distinct int lists —
    * callers bring their own clustering (label means, k-means, a
    * sample); the index only promises it never moves. */
  def init(emb: DataFrame, idCol: String, vecCol: String,
           centroids: DataFrame, root: String): Unit = {
    val spark = emb.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    FsIo.mkdirs(conf, root)
    val cent = centroids
      .select(col("list").cast("int").as("list"), col("cvec"))
    cent.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$root/_centroids")
    writeSegment(assign(emb, idCol, vecCol, readCentroids(spark, root)),
      segDir(root, 0))
    writeManifest(root, 0, Seq(Seg(segDir(root, 0), 0, tombstone = false)), conf)
    writePointer(root, Pointer(0, -1L), conf)
  }

  /** Append one batch as a new segment; existing segments carry by
    * reference (never read, never rewritten). Exactly-once via the
    * pointer's batchId gate. */
  def applyBatch(batch: DataFrame, idCol: String, vecCol: String,
                 root: String, batchId: Long, retain: Int = 2): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val p = readPointer(root, conf).getOrElse(throw new IllegalStateException(
      s"IVF index at $root not initialized — call init first"))
    if (batchId <= p.lastBatch) return // at-least-once replay: applied
    if (batch.isEmpty) {
      writePointer(root, p.copy(lastBatch = batchId), conf); return
    }
    val next = p.version + 1
    val dir = segDir(root, next)
    writeSegment(assign(batch, idCol, vecCol, readCentroids(spark, root)), dir)
    writeManifest(root, next,
      readManifest(root, p.version, conf) :+ Seg(dir, next, tombstone = false),
      conf)
    writePointer(root, Pointer(next, batchId), conf)
    gc(root, next, retain, conf)
  }

  /** DELETE a batch of ids — the decontamination / opt-out removal
    * path: the ids land as one tiny TOMBSTONE segment; no posting
    * segment is touched (per-batch cost O(delete batch)). Visibility
    * follows LSM sequence order: a tombstone at version v kills only
    * postings committed at versions < v, so a LATER re-insert of the
    * same id is live again. [[compact]] applies tombstones physically
    * and drops them. Same batchId exactly-once gate as inserts. */
  def applyDeleteBatch(ids: DataFrame, idCol: String, root: String,
                       batchId: Long, retain: Int = 2): Unit = {
    val spark = ids.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val p = readPointer(root, conf).getOrElse(throw new IllegalStateException(
      s"IVF index at $root not initialized — call init first"))
    if (batchId <= p.lastBatch) return // at-least-once replay: applied
    if (ids.isEmpty) {
      writePointer(root, p.copy(lastBatch = batchId), conf); return
    }
    val next = p.version + 1
    val dir = delDir(root, next)
    ids.select(col(idCol).cast("long").as("vec_id")).distinct()
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
    writeManifest(root, next,
      readManifest(root, p.version, conf) :+ Seg(dir, next, tombstone = true),
      conf)
    writePointer(root, Pointer(next, batchId), conf)
    gc(root, next, retain, conf)
  }

  /** All live tombstones as (vec_id, _del_v), or None when the index
    * carries none (the common case skips the anti-join entirely). */
  private def tombstones(spark: SparkSession,
                         segs: Seq[Seg]): Option[DataFrame] = {
    val t = segs.filter(_.tombstone)
    if (t.isEmpty) None
    else Some(t.map(e => spark.read.parquet(e.dir)
        .select(col("vec_id"), lit(e.version).as("_del_v")))
      .reduce(_ unionByName _))
  }

  /** LSM visibility: drop postings whose segment version precedes a
    * matching tombstone. Equi-join on vec_id with the version
    * inequality as a residual condition — never a cartesian. */
  private def applyTombstones(postings: DataFrame,
                              tombs: Option[DataFrame]): DataFrame =
    tombs match {
      case None => postings
      case Some(t) =>
        postings.join(t,
          postings("vec_id") === t("vec_id") &&
            postings("_seg_v") < t("_del_v"), "left_anti")
    }

  /** Every posting across the live segments: (vec_id, list, embedding).
    * Per-segment reads recover the `list` partition column. */
  def currentAll(spark: SparkSession, root: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = readPointer(root, conf).getOrElse(throw new IllegalStateException(
      s"IVF index at $root not initialized — call init first"))
    val segs = readManifest(root, p.version, conf)
    val postings = segs.filterNot(_.tombstone)
      .map(e => spark.read.parquet(e.dir)
        .withColumn("_seg_v", lit(e.version)))
      .reduce(_ unionByName _)
      .select(col("vec_id"), col("list").cast("int").as("list"),
        col("embedding"), col("_seg_v"))
    applyTombstones(postings, tombstones(spark, segs)).drop("_seg_v")
  }

  /** Top-k by integer-grid cosine over the nprobe nearest lists: one
    * tiny driver read picks the lists (nprobe ints — bounded), then ONLY
    * the matching `seg/sNNNNN/list=K` directories open. The candidate
    * scan is (nprobe/nlists) of the corpus; ranking is
    * TakeOrderedAndProject (partition-local heaps + driver merge of k),
    * never a single-partition window over the candidates. */
  def probeTopK(spark: SparkSession, root: String, queryVec: DataFrame,
                k: Int, nprobe: Int): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = readPointer(root, conf).getOrElse(throw new IllegalStateException(
      s"IVF index at $root not initialized — call init first"))
    val probed = readCentroids(spark, root)
      .crossJoin(broadcast(queryVec))
      .withColumn("qd2", dist2(col("cvec"), col("qvec")))
      .orderBy(col("qd2"), col("list"))
      .limit(nprobe)
      .select(col("list")).collect().map(_.getInt(0)).toSeq // nprobe ints
    val segs = readManifest(root, p.version, conf)
    val dirs = for {
      seg <- segs if !seg.tombstone
      l <- probed
      d = s"${seg.dir}/list=$l"
      if FsIo.exists(conf, d) // a list can be empty in a segment
    } yield (d, l, seg.version)
    val empty = currentAll(spark, root).filter(lit(false))
      .select(col("vec_id"), col("list"), col("embedding"))
    val cand0 =
      if (dirs.isEmpty) empty.withColumn("_seg_v", lit(0))
      else dirs.map { case (d, l, v) =>
        spark.read.parquet(d).withColumn("list", lit(l))
          .withColumn("_seg_v", lit(v))
          .select(col("vec_id"), col("list"), col("embedding"), col("_seg_v"))
      }.reduce(_ unionByName _)
    val cand = applyTombstones(cand0, tombstones(spark, segs)).drop("_seg_v")
    val topk = cand.crossJoin(broadcast(queryVec))
      .withColumn("cosine",
        Similarity.cosineQuantized(col("embedding"), col("qvec")))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
    import org.apache.spark.sql.expressions.Window
    topk.withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id"))))
      .select(col("rank"), col("vec_id"), col("list"), col("cosine"))
  }

  /** BATCHED probes — the serving shape: per-query top-k for a whole
    * query frame (qid, qvec) in ONE pass, never a per-query driver
    * loop. Each query's nprobe nearest lists compute COLUMNAR (sort the
    * (d2, list) struct array, slice nprobe — same tie order as
    * [[probeTopK]]); only the UNION of needed list directories opens
    * (one driver collect bounded by nlists, not by query count);
    * candidates join the broadcast queries on list membership and rank
    * per qid through a PARTITIONED window — executor state is one
    * query's candidate stream, however many queries ride the batch.
    * Queries are broadcast, so the batch should be serving-sized
    * (≲10^5); corpus-scale "queries" are a self-join, not a probe. */
  def probeTopKBatch(spark: SparkSession, root: String, queries: DataFrame,
                     k: Int, nprobe: Int): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = readPointer(root, conf).getOrElse(throw new IllegalStateException(
      s"IVF index at $root not initialized — call init first"))
    val packed = readCentroids(spark, root).agg(
      collect_list(struct(col("list"), col("cvec"))).as("cents"))
    val qLists = queries.select(col("qid"), col("qvec"))
      .crossJoin(broadcast(packed))
      .withColumn("probe_lists",
        transform(slice(array_sort(transform(col("cents"),
          c => struct(dist2(col("qvec"), c.getField("cvec")).as("d2"),
            c.getField("list").as("list")))), 1, nprobe),
          s => s.getField("list")))
      .select(col("qid"), col("qvec"), col("probe_lists"))
      .localCheckpoint(false) // consumed twice: list union + join
    val needed = qLists.select(explode(col("probe_lists")).as("list"))
      .distinct().collect().map(_.getInt(0)).toSet // bounded by nlists
    val segs = readManifest(root, p.version, conf)
    val dirs = for {
      seg <- segs if !seg.tombstone
      l <- needed.toSeq.sorted
      d = s"${seg.dir}/list=$l"
      if FsIo.exists(conf, d)
    } yield (d, l, seg.version)
    val empty = currentAll(spark, root).filter(lit(false))
      .withColumn("_seg_v", lit(0))
    val cand0 =
      if (dirs.isEmpty) empty
      else dirs.map { case (d, l, v) =>
        spark.read.parquet(d).withColumn("list", lit(l))
          .withColumn("_seg_v", lit(v))
          .select(col("vec_id"), col("list"), col("embedding"), col("_seg_v"))
      }.reduce(_ unionByName _)
    val cand = applyTombstones(cand0, tombstones(spark, segs)).drop("_seg_v")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.join(broadcast(qLists),
        array_contains(qLists("probe_lists"), cand("list")))
      .withColumn("cosine",
        Similarity.cosineQuantized(col("embedding"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("list"),
        col("cosine"))
  }

  /** Merge every live segment into ONE (probe cost is linear in segment
    * count; this amortizes it) — a maintenance version: lastBatch
    * unchanged, contents identical. Returns the new segment count (1). */
  def compact(spark: SparkSession, root: String, retain: Int = 2): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = readPointer(root, conf).getOrElse(throw new IllegalStateException(
      s"IVF index at $root not initialized — call init first"))
    val segs = readManifest(root, p.version, conf)
    if (segs.size <= 1) return segs.size
    val next = p.version + 1
    val dir = segDir(root, next)
    // currentAll already applies the tombstones; the rewrite makes the
    // deletions physical, so the tombstone segments drop from the
    // manifest (and GC collects them once out of retention)
    writeSegment(currentAll(spark, root), dir)
    writeManifest(root, next, Seq(Seg(dir, next, tombstone = false)), conf)
    writePointer(root, Pointer(next, p.lastBatch), conf)
    gc(root, next, retain, conf)
    1
  }

  /** Drop aged-out manifests; delete segment dirs no retained manifest
    * references (segments carry by reference across versions, so
    * liveness is the union over the retention window). Orphans from a
    * crash-before-swap fall out here too. */
  private def gc(root: String, current: Int, retain: Int,
                 conf: Configuration): Unit = {
    val floor = current - retain
    (0 until floor).foreach(v => FsIo.delete(conf, manifestPath(root, v)))
    val live = (math.max(0, floor) to current)
      .filter(v => FsIo.exists(conf, manifestPath(root, v)))
      .flatMap(v => readManifest(root, v, conf).map(_.dir)).toSet
    Seq("seg", "del").foreach { kind =>
      if (FsIo.exists(conf, s"$root/$kind"))
        FsIo.listDirNames(conf, s"$root/$kind").foreach { d =>
          if (!live.exists(_.endsWith(s"/$kind/$d")))
            FsIo.delete(conf, s"$root/$kind/$d")
        }
    }
  }

  /** Test cleanup. */
  def destroy(root: String,
              conf: Configuration = new Configuration()): Unit =
    FsIo.delete(conf, root)
}
