package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming near-dup ingest — the Structured-Streaming twin of
  * [[graft.pipeline.Dedup]] for a document stream: incremental exact
  * dedup and incremental MinHash-LSH candidate emission, both with
  * per-key state sharded by the state store across executors.
  *
  *  - [[exactDedup]]: state keyed by the normalised content hash
  *    ([[graft.pipeline.Dedup.contentKey]] semantics); every arriving doc
  *    emits its keeper (itself when its content is first seen — under
  *    id-ordered ingest this equals the batch min-id keeper). State is
  *    ~40 bytes per DISTINCT content, the streaming form of the exact
  *    collapse front.
  *  - [[lshCandidates]]: the SAME scan-side signature expressions as the
  *    batch path (word-n-gram xxhash64 shingles → MinHashSig → banded
  *    keys), then state keyed by (band_id, band_hash): each bucket keeps
  *    its member ids and every arriving doc emits a candidate pair per
  *    existing member. A downstream streaming `dropDuplicates` dedups
  *    pairs that collide in several bands, so the cumulative output
  *    equals batch [[graft.pipeline.Dedup.minhashCandidates]] over the
  *    documents ingested so far (StreamingSpec pins the equality across
  *    micro-batch splits).
  *
  * Scale notes: bucket state holds member ids only (8 bytes/doc/band);
  * `maxBucketMembers` caps degenerate buckets (a bucket past the cap is
  * near-certainly one clone class — pairs against the first `cap`
  * members still link every late member for connected components). For
  * corpus-lifetime runs back the state store with RocksDB and compact
  * per retention policy; state never expires here (dedup is
  * corpus-lifetime by definition).
  */
object StatefulDedup {

  case class Doc(docId: Long, text: String)
  case class ExactDup(docId: Long, keeperId: Long, isFirst: Boolean)
  case class CandPair(idA: Long, idB: Long)
  case class Fetch(fetchId: Long, url: String)
  case class FrontierDecision(fetchId: Long, canonicalUrl: String,
                              isFirst: Boolean)

  case class BandKey(bandId: Int, bandHash: Long)
  case class BandDoc(bandId: Int, bandHash: Long, docId: Long)

  /** Incremental exact dedup: (docId, keeperId, isFirst) per document. */
  def exactDedup(ds: Dataset[Doc]): Dataset[ExactDup] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.select(col("docId"),
        graft.pipeline.Dedup.contentKey(col("text")).as("ck"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, ExactDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, docs, state) =>
        val sorted = docs.map(_._1).toArray.sorted
        val out = sorted.map { id =>
          state.getOption match {
            case Some(keeper) => ExactDup(id, keeper, isFirst = false)
            case None         => state.update(id); ExactDup(id, id, isFirst = true)
          }
        }
        out.iterator
      }
  }

  /** Streaming crawl-frontier dedup: canonicalize each URL
    * ([[graft.functions.UrlNormalize]] — case/port/dot-segment/tracking-
    * param variants collapse to one key) and admit only the FIRST fetch
    * per canonical URL; later spellings report the fetch they collapsed
    * onto. Within a micro-batch, ties break by fetchId for determinism.
    * State is 8 bytes per distinct URL, sharded by the state store; a
    * corpus-lifetime frontier backs this with RocksDB and, at crawl
    * scale, fronts it with a Bloom pre-filter so the state store only
    * sees probable-new URLs. */
  def urlFrontier(ds: Dataset[Fetch]): Dataset[FrontierDecision] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.select(col("fetchId"),
        graft.functions.UrlNormalize.urlNormalize(col("url")).as("u"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, FrontierDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (u, rows, state) =>
        rows.map(_._1).toArray.sorted.map { id =>
          state.getOption match {
            case Some(_) => FrontierDecision(id, u, isFirst = false)
            case None => state.update(id); FrontierDecision(id, u, isFirst = true)
          }
        }.iterator
      }
  }

  /** Incremental MinHash-LSH candidate pairs (idA < idB, deduped across
    * bands with streaming dropDuplicates state). */
  def lshCandidates(ds: Dataset[Doc], ngram: Int = 3, numHashes: Int = 16,
                    bands: Int = 4, maxBucketMembers: Int = 10000): Dataset[CandPair] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    // identical scan-side expressions to the batch path — bucket keys are
    // bit-equal, so batch/stream candidate sets coincide
    val grams = ds
      .select(col("docId"), graft.pipeline.TextStats.tokens(col("text")).as("_toks"))
      .select(col("docId"), sort_array(array_distinct(transform(
        graft.pipeline.TextStats.ngramsOfTokens(col("_toks"), ngram),
        g => xxhash64(g)))).as("grams"))
      .filter(size(col("grams")) > 0) // degenerate docs carry no evidence
    val banded = grams
      .select(col("docId"),
        explode(graft.pipeline.Dedup.lshBands(
          graft.functions.MinHashSig.minhashSig(col("grams"), numHashes),
          bands, rows)).as("band"))
      .select(col("band.band_id").as("bandId"),
        col("band.band_hash").as("bandHash"), col("docId"))
      .as[BandDoc]
    banded
      .groupByKey(d => BandKey(d.bandId, d.bandHash))
      .flatMapGroupsWithState[Array[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, docs, state) =>
        var members = state.getOption.getOrElse(Array.empty[Long])
        val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
        docs.map(_.docId).toArray.sorted.foreach { id =>
          if (!members.contains(id)) {
            members.foreach { m =>
              out += (if (m < id) CandPair(m, id) else CandPair(id, m))
            }
            if (members.length < maxBucketMembers) members = members :+ id
          }
        }
        state.update(members)
        out.iterator
      }
      .dropDuplicates("idA", "idB")
  }

  /** Composed streaming ingest — the recommended default for
    * duplicate-heavy streams (PLANS §35): exact-dedup state routes only
    * FIRST-seen contents into the LSH banding, the streaming form of the
    * batch exact-collapse front ([[graft.pipeline.Dedup.nearDuplicates]]'
    * distinct-content pre-pass). Bucket state and candidate volume are
    * then bounded by DISTINCT contents, not stream length — a stream
    * that re-sends one document a million times adds one band-state
    * entry total, not a million-member bucket.
    *
    * Emits candidate pairs between KEEPER ids only (keeper = min id of a
    * content, as in the batch collapse front); run [[exactDedup]]
    * alongside for the per-document keeper mapping (a streaming query
    * has one sink, so the two outputs are two queries over the same
    * source — their state stores are independent).
    *
    * State bounds: exact state ~40 B/distinct content, band state
    * 8 B/distinct content/band, dropDuplicates one row per emitted pair. */
  def ingest(ds: Dataset[Doc], ngram: Int = 3, numHashes: Int = 16,
             bands: Int = 4, maxBucketMembers: Int = 10000): Dataset[CandPair] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val firsts = ds
      .select(col("docId"), col("text"),
        graft.pipeline.Dedup.contentKey(col("text")).as("ck"))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, docs, state) =>
        if (state.exists) Iterator.empty // content already routed
        else {
          val first = docs.minBy(_._1)
          state.update(first._1)
          Iterator.single(Doc(first._1, first._2))
        }
      }
    lshCandidates(firsts, ngram, numHashes, bands, maxBucketMembers)
  }
}
