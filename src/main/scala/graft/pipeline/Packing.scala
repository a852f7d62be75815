package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step that lays documents into
  * fixed-capacity context windows ("bins") so a tokenised corpus ships to
  * the trainer with minimal padding (cf. xclim's role for analysis data;
  * this half is the pretraining twin the reference has no need for).
  *
  * The packing rule is the deterministic shard-local GREEDY scan: shard
  * documents by `id mod shards` (engine-portable, so an external oracle
  * can replay it), order by id inside a shard, and open a new bin
  * whenever the next document does not fit the current one. Greedy is the
  * industry default for context packing: within 1 bin of optimal per run
  * of same-length docs, and — unlike best-fit — independent of anything
  * but the running total, which is what makes it distributable.
  */
object Packing {

  /** Pack documents into `maxLen`-token bins, greedy within `id % shards`
    * shards ordered by id. A document longer than `maxLen` gets a bin of
    * its own (truncation/splitting is the caller's policy, applied
    * downstream); empty documents occupy zero tokens of the current bin.
    * Returns one row per document: (idCol, shard, bin, bin_offset, n_tok)
    * with `bin` shard-local and `bin_offset` the token start inside its bin.
    *
    * Scale: one hash shuffle on the shard key + an O(1)-state scan per
    * partition (`sortWithinPartitions`, no global ordering, no driver
    * collect). Shards are independent packing domains, so the output is
    * invariant to the physical partitioning and parallelism is `shards`
    * at any corpus size — pick shards ≈ corpus/10⁴ docs upstream. */
  def packGreedy(df: DataFrame, idCol: String, nTok: Column,
                 maxLen: Int, shards: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        nTok.cast("int").as("n_tok"))
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)).cast("int"))
    base.select(col("shard"), col("id"), col("n_tok")).as[(Int, Long, Int)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .mapPartitions { it =>
        // several shards may share a partition; the scan resets its O(1)
        // state (current bin + fill) at every shard boundary
        var curShard = -1; var bin = 0; var used = 0
        it.map { case (sh, id, nt) =>
          if (sh != curShard) { curShard = sh; bin = 0; used = 0 }
          else if (used > 0 && used + nt > maxLen) { bin += 1; used = 0 }
          val off = used
          used += nt
          (id, sh, bin, off, nt)
        }
      }
      .toDF("id", "shard", "bin", "bin_offset", "n_tok")
      .select(col("id").as(idCol), col("shard"), col("bin"),
        col("bin_offset"), col("n_tok"))
  }

  /** Sliding-window document chunking — the retrieval/context-prep twin
    * of [[packGreedy]]: split each document into `size`-token windows
    * every `stride` tokens (stride < size ⇒ overlapping chunks, the RAG
    * default), emitting (id, chunk_id, chunk text, chunk_tokens,
    * token_start). Whitespace tokenisation follows
    * [[TextStats.tokenCount]] (empty/blank text ⇒ zero tokens ⇒ no
    * chunks); every window start < n emits, so the final chunk may be
    * partial. Pure Column expressions — split / sequence / explode /
    * slice / array_join all stay inside whole-stage codegen, so at
    * corpus scale this is a narrow projection with no shuffle at all:
    * chunk rows stream straight from the scan into the consumer. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    df.select(col(idCol), when(length(trim(col(textCol))) === 0,
          array().cast("array<string>"))
        .otherwise(split(trim(col(textCol)), "\\s+")).as("toks"))
      .withColumn("n", size_(col("toks")))
      .withColumn("st", explode(when(col("n") > 0,
        sequence(lit(0), col("n") - 1, lit(stride)))
        .otherwise(array().cast("array<int>"))))
      .select(col(idCol),
        (col("st") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("toks"), col("st") + 1, lit(size)), " ").as("chunk"),
        least(lit(size), col("n") - col("st")).cast("int").as("chunk_tokens"),
        col("st").as("token_start"))
  }

  // `size` the Column function, shadowed by the `size` parameter above
  /** Length-bucketed batch assignment — the dynamic-batching prep step:
    * rows bucket by padded length (`step`-wide bands, capped at `maxLen`),
    * then take deterministic batch numbers inside each bucket (ordered by
    * id — stable under retries and partitioning). Each row's padding
    * waste is its bucket ceiling minus its true length, the quantity
    * batching exists to minimise. One shuffle on the bucket key; buckets
    * are Zipf-ish in practice, so at extreme scale salt the dominant
    * bucket and renumber (the §41 skew rule) — batch ids only need to be
    * unique within a bucket, not dense. */
  def lengthBuckets(df: DataFrame, idCol: String, nTok: Column,
                    step: Int, maxLen: Int, batchSize: Int): DataFrame = {
    require(step >= 1 && maxLen % step == 0 && batchSize >= 1,
      s"bad step=$step maxLen=$maxLen batchSize=$batchSize")
    val n = least(nTok, lit(maxLen))
    val hi = (ceil(n.cast("double") / step) * step).cast("int")
    val w = Window.partitionBy(col("bucket_hi")).orderBy(col(idCol))
    df.select(col(idCol), nTok.as("n_tokens"),
        greatest(hi, lit(step)).as("bucket_hi"))
      .withColumn("batch_id",
        // explicit floor: Spark's double->int cast truncates but other
        // engines round, so the bare cast is not portable
        floor((row_number().over(w) - 1) / batchSize).cast("int"))
      .withColumn("pad_waste", col("bucket_hi") - least(col("n_tokens"), lit(maxLen)))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
