package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication at training-data scale: exact, MinHash-LSH, SimHash and
  * n-gram-Jaccard near-dup. Design target is 100 TB of documents:
  *
  *  - Exact dedup is ONE hash-agg shuffle keyed on a 128-bit content hash —
  *    never on the raw text (shuffle bytes ~32/doc instead of doc size).
  *  - MinHash-LSH shuffles (band_id, band_hash) pairs — `bands x 16` bytes
  *    per doc — then joins candidate pairs only inside buckets; the full
  *    O(n^2) comparison never materialises. Signatures are computed
  *    scan-side with codegen'd expressions (xxhash64 + affine rehash), no
  *    Python/Scala UDFs.
  *  - Verification (true Jaccard) runs only on candidate pairs, whose
  *    cardinality LSH keeps near-linear for reasonable thresholds.
  */
object Dedup {

  /** Normalised content hash for exact dedup. */
  def contentKey(text: Column): Column =
    md5(graft.functions.WinnowNormalize.lowerCollapseWs(text))

  /** Exact duplicate groups: one row per distinct content with the keeper id
    * (min id), the duplicate count, and ids of members. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(contentKey(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_members"))

  /** Bag-of-words (order-insensitive) duplicate key: hash of the sorted
    * token multiset — catches shuffled near-copies cheaply. */
  def bagKey(text: Column): Column =
    md5(concat_ws(" ", array_sort(split(lower(trim(text)), "\\s+"))))

  /** MinHash signature: `numHashes` min-values over shingle hashes (Broder
    * 1997). The k-th hash function is xxhash64 seeded by k (hashing the
    * (shingle, k) tuple), which stays inside the 64-bit ring without the
    * overflow an affine rehash would hit under ANSI arithmetic.
    * Returns ARRAY<BIGINT> length numHashes; empty shingle set -> nulls.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column = {
    val distinct = array_distinct(shingles)
    array((0 until numHashes).map { k =>
      array_min(transform(distinct, s => xxhash64(s, lit(k))))
    }: _*)
  }

  /** Banded LSH keys from a signature: `bands` hashes, each over
    * numHashes/bands contiguous signature slots. Explode to (band_id,
    * band_hash) for the bucket join. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        xxhash64(concat_ws(",", slice(sig, b * rows + 1, rows))).as("band_hash"))
    }: _*)

  /** Candidate near-dup pairs via MinHash-LSH over word `n`-gram shingles.
    * Output: (id_a, id_b) with id_a < id_b, distinct. The heavy join is
    * bucket-local: groupBy (band_id, band_hash) keeps only buckets with >1
    * doc, then pairs are generated inside buckets. Carries the
    * exact-collapse front (see [[nearDuplicates]]): identical shingle sets
    * have identical signatures, so clone classes band as ONE participant
    * and their pairs are generated — output unchanged, cost
    * duplication-invariant. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        ngram: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val classes = dropDegenerate(
      gramClasses(hashedShingles(df, idCol, textCol, ngram)).localCheckpoint(false))
    val repCands = minhashCandidatesFromHashes(
      classes.select(col("id"), col("grams").as("hashes")), numHashes, bands)
    classPairs(classes).unionByName(
      expandByClass(repCands, classes, Seq.empty))
  }

  /** Equal-shingle-set classes with sorted member lists; `id` is the class
    * representative (minimum member). Degenerate docs — null text or fewer
    * than `ngram` tokens, whose shingle set is empty — are EXCLUDED: they
    * carry no n-gram evidence, and folding them into one clone class would
    * report J=1.0 for pairs the uncollapsed join scores 0/0 = NaN.
    *
    * The exclusion filter runs on the AGGREGATED classes (one row per
    * distinct gram set), and every caller checkpoints the classes frame
    * before branching — putting `size(grams) > 0` upstream of the groupBy
    * instead lets predicate pushdown substitute the whole interpreted
    * shingle expression (transform + xxhash64 + sort_array) into the
    * predicate, re-evaluating it per row (measured ×6 on
    * q_minhash_candidates). */
  private def gramClasses(grams: DataFrame): DataFrame =
    grams.groupBy(col("grams"))
      .agg(sort_array(collect_list(col("id"))).as("ms"))
      .withColumn("id", element_at(col("ms"), 1))

  /** Post-checkpoint degenerate-class exclusion — see [[gramClasses]]. */
  private def dropDegenerate(classes: DataFrame): DataFrame =
    classes.filter(col("grams").isNotNull && size(col("grams")) > 0)

  /** All within-class (id_a < id_b) pairs, with optional constant value
    * columns appended. */
  private def classPairs(classes: DataFrame, values: Seq[Column] = Seq.empty): DataFrame =
    classes.filter(size(col("ms")) >= 2)
      .withColumn("id_a", explode(col("ms")))
      .withColumn("id_b", explode(col("ms")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a") +: col("id_b") +: values: _*)

  /** Expand representative-level pairs to all member pairs, carrying the
    * listed value columns through unchanged. */
  private def expandByClass(repPairs: DataFrame, classes: DataFrame,
                            valueCols: Seq[String]): DataFrame =
    repPairs
      .join(classes.select(col("id").as("id_a"), col("ms").as("_ma")), "id_a")
      .join(classes.select(col("id").as("id_b"), col("ms").as("_mb")), "id_b")
      .withColumn("x", explode(col("_ma")))
      .withColumn("y", explode(col("_mb")))
      .select(least(col("x"), col("y")).as("id_a") +:
        greatest(col("x"), col("y")).as("id_b") +: valueCols.map(col): _*)

  /** (id, grams): sorted distinct xxhash64 shingle sets. Tokens are
    * materialised in their own projection first — see
    * [[TextStats.tokens]] for why that matters. */
  private def hashedShingles(df: DataFrame, idCol: String, textCol: String,
                             ngram: Int): DataFrame =
    df.select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("_toks"))
      .select(col("id"), sort_array(array_distinct(transform(
        TextStats.ngramsOfTokens(col("_toks"), ngram), g => xxhash64(g)))).as("grams"))

  /** Same, over a frame of (id, hashes ARRAY<BIGINT>) pre-hashed shingle
    * sets — the signature is the native one-pass [[MinHashSig]] kernel. */
  private[pipeline] def minhashCandidatesFromHashes(hashed: DataFrame, numHashes: Int,
                                                    bands: Int): DataFrame = {
    val rows = numHashes / bands
    val sigs = hashed.select(col("id"),
        graft.functions.MinHashSig.minhashSig(col("hashes"), numHashes).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), bands, rows)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_hash"))
    val a = sigs.alias("a"); val b = sigs.alias("b")
    a.join(b, col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  // ---- incremental dedup against a persisted index -----------------
  //
  // The daily-increment shape at 100 TB: the corpus is fingerprinted and
  // banded ONCE into two narrow lake tables; each arriving batch bands
  // itself, joins the (tiny-per-batch) band index, and verifies only the
  // colliding pairs — the corpus text is never rescanned. bands=numHashes
  // (one row per band) pins recall ~1 for J >= 0.7 exactly as
  // q_minhash_candidates does, so the output EQUALS the exhaustive
  // batch-vs-corpus truth the oracle computes.

  /** Fingerprint-class table for the index: one row per DISTINCT gram
    * set — (id = representative, grams, ms = sorted member ids). The
    * exact-collapse front ([[nearDuplicates]]'s design #19) applied to
    * the index: verbatim clones band as ONE participant, so a
    * heavily-duplicated corpus cannot blow up the bucket join.
    * Degenerate docs (empty set) excluded, same contract as
    * [[gramClasses]]. */
  def fingerprintIndex(df: DataFrame, idCol: String, textCol: String,
                       ngram: Int = 3): DataFrame =
    // checkpoint BEFORE dropDegenerate — its size() filter otherwise
    // pushes below the groupBy and re-evaluates the whole interpreted
    // shingle expression per row (the ×6 documented at [[gramClasses]])
    dropDegenerate(gramClasses(hashedShingles(df, idCol, textCol, ngram))
        .localCheckpoint(false))
      .select(col("id"), col("grams"), col("ms"))

  /** Band table for the index: (id, band_id, band_hash) over the class
    * representatives. */
  def bandTable(fp: DataFrame, numHashes: Int = 16,
                bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    fp.select(col("id"),
        graft.functions.MinHashSig.minhashSig(col("grams"), numHashes).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), bands, rows)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_hash"))
  }

  /** Near-dup pairs between `newDocs` and an existing index, verified at
    * `threshold`. Both sides collapse to gram classes first; LSH, the
    * band join and the verify kernel all run at class level, and the
    * class pairs expand to member pairs only at the end (identical gram
    * sets share one verdict). Output (new_id, old_id, n_inter, n_union,
    * jaccard) — the jaccard an exact-int ratio. */
  def incrementalCandidates(indexClasses: DataFrame, indexBands: DataFrame,
                            newDocs: DataFrame, idCol: String, textCol: String,
                            ngram: Int = 3, numHashes: Int = 16,
                            bands: Int = 16,
                            threshold: Double = 0.7): DataFrame = {
    val nc = fingerprintIndex(newDocs, idCol, textCol, ngram)
    val cand = bandTable(nc.select(col("id"), col("grams")), numHashes, bands)
      .join(indexBands.select(col("id").as("old_rep"),
        col("band_id"), col("band_hash")), Seq("band_id", "band_hash"))
      .select(col("id").as("new_rep"), col("old_rep")).distinct()
    cand
      .join(nc.select(col("id").as("new_rep"), col("grams").as("ng"),
        col("ms").as("new_ms")), Seq("new_rep"))
      .join(indexClasses.select(col("id").as("old_rep"),
        col("grams").as("og"), col("ms").as("old_ms")), Seq("old_rep"))
      .withColumn("n_inter", graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("ng"), col("og")).cast("long"))
      .withColumn("n_union",
        (size(col("ng")) + size(col("og"))).cast("long") - col("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .filter(col("jaccard") >= threshold)
      .withColumn("new_id", explode(col("new_ms")))
      .withColumn("old_id", explode(col("old_ms")))
      .select(col("new_id"), col("old_id"), col("n_inter"), col("n_union"),
        col("jaccard"))
  }

  /** Exact Jaccard similarity between two array columns (verification step
    * after LSH candidate generation). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(array_distinct(a), array_distinct(b))).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** Near-dup pairs with verified n-gram Jaccard >= threshold. The shingle
    * sets are hashed (xxhash64) ONCE: the same sorted distinct hash array
    * feeds the MinHash signature, a size-ratio candidate prune
    * (J <= min/max of set sizes), and the codegen'd sorted-merge
    * intersection of the verify step — no string array ever joins.
    *
    * Exact-collapse front (design #19): identical shingle sets have
    * identical MinHash signatures, so k verbatim copies would collide in
    * EVERY band and put k²/2 verify kernels in each bucket. Classes
    * collapse to one LSH+verify participant; within-class pairs carry
    * J = 1 and cross-class member pairs carry the representative pair's J
    * (identical gram arrays) — row-for-row the uncollapsed output, except
    * that degenerate docs (empty shingle set) emit no pairs at all rather
    * than the uncollapsed join's NaN-scored ones (see [[gramClasses]]). */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     ngram: Int = 3, threshold: Double = 0.8,
                     numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val classes = dropDegenerate(
      gramClasses(hashedShingles(df, idCol, textCol, ngram)).localCheckpoint(false))
    val reps = classes.select(col("id"), col("grams"))
    val cands = minhashCandidatesFromHashes(
      reps.select(col("id"), col("grams").as("hashes")), numHashes, bands)
    val ga = reps.select(col("id").as("id_a"), col("grams").as("grams_a"),
      size(col("grams")).as("sz_a"))
    val gb = reps.select(col("id").as("id_b"), col("grams").as("grams_b"),
      size(col("grams")).as("sz_b"))
    val common = graft.functions.SortedIntersectCount
      .sortedIntersectCount(col("grams_a"), col("grams_b"))
    val repPairs = cands.join(ga, "id_a").join(gb, "id_b")
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .withColumn("jaccard", common.cast("double") /
        (col("sz_a") + col("sz_b") - common).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    classPairs(classes, Seq(lit(1.0).as("jaccard"))) // sz/(2sz−sz) of equal sets
      .unionByName(expandByClass(repPairs, classes, Seq("jaccard")))
  }

  /** Pairwise n-gram Jaccard via an INVERTED-INDEX equi-join instead of
    * nested array intersections: explode distinct shingles to (block, token,
    * id) postings, self-join on (block, token), count common tokens per
    * pair, and derive |union| = |A| + |B| - common. This keeps everything in
    * codegen'd joins/aggregates (no interpreted array lambdas) and is the
    * formulation that scales: the shuffle is keyed on (block, token).
    *
    * `prefixFilter = true` (the default, and the form that scales) bounds
    * the postings blow-up with the df-ordered PREFIX FILTER of
    * AllPairs/SSJoin (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06):
    * order every document's tokens by ascending global document frequency
    * (rarest first, token text as the tie-break) and index ONLY the first
    *   L = |d| − ⌈t·|d|⌉ + 1
    * tokens. J(A,B) ≥ t implies |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and two sets with
    * |A∩B| ≥ α must share an element inside their (|x|−α+1)-prefixes under
    * any global order, so the prefix-to-prefix equi-join generates EVERY
    * qualifying pair — the filter is LOSSLESS, unlike an absolute df-cut,
    * whose recall silently collapses as the corpus (and with it every
    * token's df) grows. The df ordering is what makes the prefix cheap:
    * the indexed tokens are each document's rarest, so Σ df² over prefix
    * postings — the candidate bound — shrinks by orders of magnitude while
    * correctness never depends on it. A size prune (t·max ≤ min) rides the
    * candidate join, and every candidate is verified with an EXACT Jaccard
    * over the full shingle sets (codegen'd sorted-merge intersection).
    * Output therefore EQUALS the exhaustive `prefixFilter = false`
    * count-form row-for-row; PropertySpec pins the equality at two corpus
    * sizes. The emitted J is the RAW |∩|/|∪| division (exact ints through
    * one correctly-rounded IEEE divide — bit-identical on any engine);
    * the threshold compares raw J ≥ t on both the Spark and oracle sides. */
  def jaccardPairsByIndex(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], ngram: Int,
                          threshold: Double, prefixFilter: Boolean = true): DataFrame = {
    require(threshold > 0.0, s"prefix-filtered Jaccard needs threshold > 0, got $threshold")
    // computed ONCE and shared by postings, the df table, the prefix
    // re-assembly and the verify side — without the checkpoint every
    // consumer re-runs the shingle expression over the raw text (and the
    // self-join runs it on BOTH sides); lazy localCheckpoint, blocks freed
    // by the ContextCleaner (same rationale as jaccardPairsBlocked)
    val grams = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
        array_distinct(TextStats.wordNgrams(col(textCol), ngram)).as("grams"): _*)
      .localCheckpoint(false)
    val postings = grams.select(col("id") +: blockCols.map(col) :+
      explode(col("grams")).as("tok"): _*)
    if (!prefixFilter) {
      val sizes = grams.select(col("id") +: blockCols.map(col) :+ size(col("grams")).as("sz"): _*)
      val a = postings.alias("a"); val b = postings.alias("b")
      val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
      val common = a.join(b, blockCond && col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("common"))
      val sa = sizes.select(col("id").as("id_a"), col("sz").as("sz_a"))
      val sb = sizes.select(col("id").as("id_b"), col("sz").as("sz_b"))
      common.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    } else {
      // document frequency per (block, token) over distinct postings: the
      // global order that puts each document's RAREST tokens in its prefix.
      // The df table is one row per distinct token — broadcast-sized
      // relative to the postings it annotates (AQE picks the strategy).
      val dfreq = postings.groupBy(blockCols.map(col) :+ col("tok"): _*)
        .agg(count(lit(1)).as("_df"))
      // re-assemble each doc's tokens sorted by (df asc, tok asc) — a
      // deterministic total order (tokens are distinct within a doc) —
      // and keep the first |d| − ceil(t·|d|) + 1 as prefix postings
      val pref = postings.join(dfreq, blockCols :+ "tok")
        .groupBy(col("id") +: blockCols.map(col): _*)
        .agg(sort_array(collect_list(struct(col("_df"), col("tok")))).as("ordered"))
        .withColumn("sz", size(col("ordered")))
        .withColumn("pt", explode(slice(col("ordered"), lit(1),
          (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))))
        .select(col("id") +: blockCols.map(col) :+ col("sz") :+
          col("pt.tok").as("tok"): _*)
      val a = pref.alias("a"); val b = pref.alias("b")
      val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
      // size prune inside the join: J >= t forces t·max(|A|,|B|) <= min
      val cands = a.join(b, blockCond && col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(threshold) * greatest(col("a.sz"), col("b.sz")))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val hashed = grams.select(col("id"),
          sort_array(transform(col("grams"), g => xxhash64(g))).as("h"),
          size(col("grams")).as("sz"))
        .localCheckpoint(false) // shared by both verify sides; stops pushdown
      val ha = hashed.select(col("id").as("id_a"), col("h").as("h_a"), col("sz").as("sz_a"))
      val hb = hashed.select(col("id").as("id_b"), col("h").as("h_b"), col("sz").as("sz_b"))
      val common = graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("h_a"), col("h_b"))
      cands.join(ha, "id_a").join(hb, "id_b")
        .withColumn("jaccard", common.cast("double") /
          (col("sz_a") + col("sz_b") - common).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
  }

  /** Blocked pairwise Jaccard with a size-ratio prefilter. For corpora whose
    * vocabulary is Zipfian, prefer `jaccardPairsByIndex`'s prefix filter; the
    * postings join degenerates when every token appears in most documents
    * (tiny synthetic vocabularies), and this direct pairwise form with the
    * J <= min(|A|,|B|)/max(|A|,|B|) pruning bound wins there. */
  def jaccardPairsBlocked(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], ngram: Int,
                          threshold: Double): DataFrame = {
    // shingle sets as SORTED distinct xxhash64 arrays: the per-pair kernel
    // becomes a primitive codegen'd merge (SortedIntersectCount) instead of
    // a per-pair string hash set; 64-bit collisions are negligible
    val grams = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
        sort_array(array_distinct(transform(
          TextStats.wordNgrams(col(textCol), ngram), g => xxhash64(g)))).as("grams"): _*)
      .withColumn("sz", size(col("grams")))
      // localCheckpoint instead of cache(): computed once, shared by both
      // sides of the self-join, and the blocks are released by the
      // ContextCleaner when the result is dropped — cache() would pin the
      // plan in the shared CacheManager until an explicit unpersist, a
      // memory leak when called repeatedly in a long-lived session
      .localCheckpoint(false)
    // EXACT-COLLAPSE front (design #19, as in nearDupComponents and the
    // embedding grid): docs with IDENTICAL shingle sets within a block
    // collapse to one compare participant — k verbatim copies otherwise
    // put k²/2 merge kernels in their block. Member pairs are GENERATED:
    // within a class J = 1 exactly, across classes every member pair
    // shares the representative pair's J (identical gram arrays), so the
    // output equals the uncollapsed join row-for-row.
    // degenerate docs (empty shingle set) are excluded — see [[gramClasses]]
    val classes = grams
      .filter(col("grams").isNotNull && col("sz") > 0)
      .groupBy(blockCols.map(col) :+ col("grams"): _*)
      .agg(sort_array(collect_list(col("id"))).as("ms"), first(col("sz")).as("sz"))
      .withColumn("id", element_at(col("ms"), 1))
      .localCheckpoint(false)
    val within = classes.filter(size(col("ms")) >= 2)
      .withColumn("jaccard", lit(1.0)) // sz/(2sz−sz) of equal sets
      .withColumn("id_a", explode(col("ms")))
      .withColumn("id_b", explode(col("ms")))
      .filter(col("id_a") < col("id_b") && col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val a = classes.alias("a"); val b = classes.alias("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    val common = graft.functions.SortedIntersectCount
      .sortedIntersectCount(col("a.grams"), col("b.grams"))
    val repPairs = a.join(b, blockCond && col("a.id") < col("b.id") &&
        least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(threshold) * greatest(col("a.sz"), col("b.sz")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (common.cast("double") /
          (col("a.sz") + col("b.sz") - common).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val cross = repPairs
      .join(classes.select(col("id").as("id_a"), col("ms").as("_ma")), "id_a")
      .join(classes.select(col("id").as("id_b"), col("ms").as("_mb")), "id_b")
      .withColumn("x", explode(col("_ma")))
      .withColumn("y", explode(col("_mb")))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"), col("jaccard"))
    within.unionByName(cross)
  }

  /** 64-bit SimHash over whitespace tokens — delegates to the native
    * codegen'd `SimHash64` Catalyst expression (single pass over the token
    * array; a Column-lambda formulation would make 64 interpreted passes). */
  def simhash(text: Column): Column =
    graft.functions.SimHash64.simhash64(split(lower(trim(text)), "\\s+"))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Portable 32-bit SimHash: token hash = md5, bit b of the hash = top bit
    * of the b-th hex nibble, fingerprint bit = sign of the (count-weighted)
    * sum of +-1 over tokens. Same semantics as [[simhash]] but built only
    * from engine-portable primitives (md5 + integer aggregation), so any
    * SQL engine reproduces it bit-exactly — the oracle-checkable twin of
    * the xxhash64 native expression.
    *
    * One explode + one hash-agg: partial aggregation collapses each doc's
    * token rows map-side (docs are never split across partitions before the
    * explode), so the shuffle carries one 32-column row per document. */
  def simhashPortable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), md5(col("tok").cast("binary")).as("h"))
    val bitSums = (1 to 32).map(b =>
      sum(when(substring(col("h"), b, 1) >= "8", 1).otherwise(-1)).as(s"_b$b"))
    val fp = (1 to 32).map(b =>
      when(col(s"_b$b") > 0, lit(1L << (32 - b))).otherwise(lit(0L))).reduce(_ + _)
    toks.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), fp.as("fp"))
  }

  /** PARAGRAPH-level exact dedup (the C4-style pass): each distinct
    * paragraph is kept exactly once corpus-wide — in the document with
    * the smallest (id, position) that contains it — and every other
    * occurrence, across documents AND repeats within one document, is
    * dropped from the reassembled text.
    *
    * Scale shape: documents are split ONCE at the scan; the dedup
    * decision travels as (id, pos, xxhash64) triples — paragraph TEXT
    * never enters the ownership shuffle, only 24-byte rows. Ownership is
    * one hash-agg (min struct per hash) plus a semi-join back on the
    * triple, and the kept positions rejoin the original row by id, where
    * the text is split again and filtered by index — so full text
    * crosses exactly one shuffle (the final id join), independent of
    * paragraph count. Distinct paragraphs merging on an xxhash64
    * collision is the usual 2^-64 exact-dedup caveat.
    *
    * Output: (idCol, n_paras, n_kept, text_kept) for every input row. */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     sep: String = "\n\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val paras = df
      .select(col(idCol).as("id"), posexplode(split(col(textCol), sepRe)).as(Seq("pos", "para")))
      .select(col("id"), col("pos"), xxhash64(col("para")).as("h"))
    val first = paras.groupBy("h")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
      .select(col("h"), col("f.id").as("id"), col("f.pos").as("pos"))
    val keptPos = paras.join(first, Seq("h", "id", "pos"), "left_semi")
      .groupBy("id").agg(sort_array(collect_list(col("pos"))).as("keep"))
    df.select(col(idCol).as("id"), col(textCol).as("txt"))
      .join(keptPos, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(split(col("txt"), sepRe)).as("n_paras"),
        coalesce(size(col("keep")), lit(0)).as("n_kept"),
        array_join(
          filter(split(col("txt"), sepRe),
            (_, i) => array_contains(coalesce(col("keep"), array().cast("array<int>")), i)),
          sep).as("text_kept"))
  }

  /** Exact substring dedup at token-window granularity (the distributed
    * re-expression of Lee et al. 2022's suffix-array pass, which the
    * single-node form cannot shard): every k-token window whose content
    * re-occurs anywhere in the corpus marks its span duplicated at every
    * occurrence EXCEPT the first in (id, pos) order; overlapping
    * duplicated spans merge per document. Returns one row per input doc:
    * (id, n_tokens, n_dup_windows, n_dup_tokens, n_tokens_kept).
    *
    * Plan shape (three shuffles, none carrying document text whole):
    * tokens explode scan-side and cross shuffle #1 (by id) as single
    * words for the sliding-window pass; windows are hashed BEFORE
    * shuffle #2 (groupBy window hash), so the corpus-wide occurrence
    * count moves (h, id, pos) 24-byte triples — one per token, the
    * inherent cost of windowed dedup, linear in corpus size; shuffle #3
    * (by id) merges the surviving duplicated spans with two window
    * functions (running max-end → island ids), rows = duplicated windows
    * only. A 64-bit window hash collides a pair of distinct windows at
    * ~n²/2⁶⁵ — at 10¹³ windows expect ~a few thousand spurious 8-token
    * spans corpus-wide, the standard accepted trade (the reference
    * pipeline's Bloom-style passes accept far more). */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val slide = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, k - 1)
    val wins = toks
      .withColumn("warr", collect_list(col("tok")).over(slide))
      .filter(size(col("warr")) === k)
      .select(col("id"), col("pos"),
        xxhash64(concat_ws(" ", col("warr"))).as("h"))
    val firsts = wins.groupBy("h")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
    val dups = wins.join(firsts, Seq("h"))
      .filter(!(col("id") === col("f.id") && col("pos") === col("f.pos")))
      .select(col("id"), col("pos").as("s"), (col("pos") + k).as("e"))
    val ord = Window.partitionBy("id").orderBy(col("s"))
    val merged = dups
      .withColumn("maxe", max(col("e")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isNew",
        when(col("maxe").isNull || col("s") > col("maxe"), 1).otherwise(0))
      .withColumn("grp", sum(col("isNew")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val perDoc = dups.groupBy("id").agg(count(lit(1)).as("n_dup_windows"))
    val covered = merged.groupBy("id")
      .agg(sum(col("e") - col("s")).as("n_dup_tokens"))
    df.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .join(covered, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_dup_tokens"), lit(0L)).cast("long").as("n_dup_tokens"),
        (col("n_tokens") - coalesce(col("n_dup_tokens"), lit(0L)))
          .cast("long").as("n_tokens_kept"))
  }

  /** [[substringDedup]]'s APPLY form: the same first-occurrence window
    * rule, materialised — tokens inside any merged duplicated span are
    * dropped and the survivors re-joined. Text re-enters on the final
    * by-id join only (same ownership-travels-as-triples shape as
    * [[paragraphDedup]]). */
  def substringDedupApply(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val slide = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, k - 1)
    val wins = toks
      .withColumn("warr", collect_list(col("tok")).over(slide))
      .filter(size(col("warr")) === k)
      .select(col("id"), col("pos"),
        xxhash64(concat_ws(" ", col("warr"))).as("h"))
    val firsts = wins.groupBy("h")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
    val spans = wins.join(firsts, Seq("h"))
      .filter(!(col("id") === col("f.id") && col("pos") === col("f.pos")))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("pos").as("s"),
        (col("pos") + k).as("e")))).as("spans"))
    df.select(col(idCol).as("id"), col(textCol).as("txt"))
      .join(spans, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("spans").isNull, col("txt")).otherwise(array_join(
          filter(split(col("txt"), " "), (_, i) =>
            !exists(col("spans"), sp => i >= sp("s") && i < sp("e"))),
          " ")).as("text_kept"))
  }

  /** Near-dup components with EXACT-DUPLICATE COLLAPSE — the production
    * composition for duplicate-heavy corpora: hash-group identical texts
    * first (one shuffle on md5), run MinHash-LSH + verify over one
    * REPRESENTATIVE per content group (min id), then star-link every
    * member to its representative and take connected components.
    *
    * Output is IDENTICAL to components over the uncollapsed pair list:
    * exact twins have Jaccard 1 (always candidates, always verified), so
    * star edges reproduce exactly the edges collapse removed, and any
    * cross-group near-dup pair survives as the representative pair
    * (identical text ⇒ identical shingles ⇒ identical signatures and
    * verify outcome). What changes is COST: LSH/verify run over distinct
    * contents, so a corpus where every document has k exact copies pays
    * 1/k of the signature work and 1/k² of the bucket-pair work. */
  def nearDupComponents(df: DataFrame, idCol: String, textCol: String,
                        ngram: Int = 3, threshold: Double = 0.8,
                        numHashes: Int = 16, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // collapse key = the sorted distinct shingle-hash set itself (J = 1 iff
    // sets equal, so this is exactly the class LSH would link at Jaccard 1;
    // no content hash that could collide, and raw text never shuffles —
    // only the same grams arrays the verify step shuffles anyway)
    val grams = hashedShingles(df, idCol, textCol, ngram)
    val withRep = grams.withColumn("rep",
      min(col("id")).over(Window.partitionBy(col("grams"))))
    val reps = withRep.filter(col("id") === col("rep")).select(col("id"), col("grams"))
      .localCheckpoint(false) // shared by candidates AND both verify sides
    val cands = minhashCandidatesFromHashes(
      reps.select(col("id"), col("grams").as("hashes")), numHashes, bands)
    val ga = reps.select(col("id").as("id_a"), col("grams").as("grams_a"),
      size(col("grams")).as("sz_a"))
    val gb = reps.select(col("id").as("id_b"), col("grams").as("grams_b"),
      size(col("grams")).as("sz_b"))
    val common = graft.functions.SortedIntersectCount
      .sortedIntersectCount(col("grams_a"), col("grams_b"))
    val lshEdges = cands.join(ga, "id_a").join(gb, "id_b")
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .filter((common.cast("double") /
        (col("sz_a") + col("sz_b") - common).cast("double")) >= threshold)
      .select("id_a", "id_b")
    // rep = min(id) of its class, so rep < id keeps the id_a < id_b convention
    val starEdges = withRep.filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"))
    connectedComponents(lshEdges.unionByName(starEdges))
  }

  /** Benchmark decontamination — the standard pre-training hygiene step:
    * flag corpus documents sharing any word n-gram (n = 8..13 typical)
    * with an evaluation set. Output: (id, n_collisions, contaminated) for
    * EVERY candidate document (clean docs carry 0/false).
    *
    * Plan: both sides explode to distinct n-gram rows; the benchmark side
    * is ngrams-of-a-benchmark (thousands of docs, bounded) so its distinct
    * grams BROADCAST into the collision join — the corpus side never
    * shuffles on text, and the only wide op is the per-doc count. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, n: Int = 8): DataFrame = {
    def grams(df: DataFrame, keep: Seq[Column]): DataFrame =
      df.select(keep :+ TextStats.tokens(col(textCol)).as("_toks"): _*)
        .select(keep :+ explode(TextStats.ngramsOfTokens(col("_toks"), n)).as("g"): _*)
    val bench = grams(benchmark, Seq.empty).distinct()
    val hits = grams(docs, Seq(col(idCol)))
      .distinct()
      .join(broadcast(bench), "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_collisions"))
    docs.select(col(idCol)).distinct()
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_collisions"), lit(0L)).as("n_collisions"),
        (coalesce(col("n_collisions"), lit(0L)) > 0).as("contaminated"))
  }

  /** Broadcast-Bloom decontamination — the corpus-scale form of
    * [[decontaminate]]. The exact form broadcasts the benchmark GRAMS
    * (strings); at 100 TB the cheap thing to ship is BITS: the
    * benchmark's distinct n-grams fold into an m-bit Bloom filter
    * (k Kirsch–Mitzenmacher probes (h1 + i·h2) mod m over two xxhash64
    * seeds), aggregated distributedly as `bit_or` over 64-bit words and
    * collected as ONE dense LONG array (m/64 elements — 16 KiB per 2^20
    * bits) into a literal the probe reads with `element_at`. Corpus
    * grams failing any probe drop at scan speed — pure codegen'd
    * Columns, no UDF (variable-count shifts built via the catalyst
    * bridge); survivors (true hits + ~fpp false positives) are verified
    * EXACTLY against the benchmark grams, so the output equals
    * [[decontaminate]] row-for-row while the shuffled/broadcast gram
    * volume shrinks to the Bloom survivors. Standard sizing: m ≈ 10·|bench
    * grams| bits and k=4 gives fpp ≈ 1%. */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
                         benchmark: DataFrame, n: Int = 8,
                         mBits: Int = 1 << 20, kHashes: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(kHashes >= 1 && kHashes <= 16, s"kHashes in [1,16], got $kHashes")
    def shl(e: Column, cnt: Column): Column =
      ColumnBridge.column(ShiftLeft(ColumnBridge.expression(e), ColumnBridge.expression(cnt)))
    def shr(e: Column, cnt: Column): Column =
      ColumnBridge.column(ShiftRight(ColumnBridge.expression(e), ColumnBridge.expression(cnt)))
    def grams(df: DataFrame, keep: Seq[Column]): DataFrame =
      df.select(keep :+ TextStats.tokens(col(textCol)).as("_toks"): _*)
        .select(keep :+ explode(TextStats.ngramsOfTokens(col("_toks"), n)).as("g"): _*)
    def positions(g: Column): Seq[Column] = {
      // reduce both hashes mod m BEFORE combining: (h1 + i·h2) mod m
      // distributes, and full-range longs would overflow ANSI arithmetic
      val h1 = pmod(xxhash64(g), lit(mBits.toLong))
      val h2 = pmod(xxhash64(g, lit(0x9E3779B97F4A7C15L)), lit(mBits.toLong))
      (0 until kHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong)))
    }
    val bench = grams(benchmark, Seq.empty).distinct().localCheckpoint(true)
    // build: k bit positions per gram -> (word, mask) -> bit_or per word;
    // the collect is bounded by m/64 longs, never by the benchmark size
    val nWords = mBits / 64
    val bits = new Array[Long](nWords)
    bench.select(explode(array(positions(col("g")): _*)).as("bit"))
      .select(shiftright(col("bit"), 6).cast("int").as("w"),
        shl(lit(1L), pmod(col("bit"), lit(64L)).cast("int")).as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("bits"))
      .collect()
      .foreach(r => bits(r.getInt(0)) = r.getLong(1))
    val bitsLit = lit(bits)
    def mightContain(g: Column): Column =
      positions(g).map { p =>
        val word = element_at(bitsLit, (shiftright(p, 6) + 1).cast("int"))
        shr(word, pmod(p, lit(64L)).cast("int")).bitwiseAND(lit(1L)) =!= lit(0L)
      }.reduce(_ && _)
    val hits = grams(docs, Seq(col(idCol)))
      .filter(mightContain(col("g")))
      .distinct()
      .join(broadcast(bench), "g") // exact verify: false positives die here
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_collisions"))
    docs.select(col(idCol)).distinct()
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_collisions"), lit(0L)).as("n_collisions"),
        (coalesce(col("n_collisions"), lit(0L)) > 0).as("contaminated"))
  }

  /** Connected components over an undirected candidate-pair edge list —
    * the cluster-assignment step that turns near-dup PAIRS into dedup
    * GROUPS (the component's min id is the canonical survivor).
    *
    * Iterative min-label propagation: each round, every node takes the
    * minimum label among itself and its neighbours; fixed point after
    * `diameter` rounds. Near-dup graphs are shallow (pairs and small
    * cliques), so 2-4 rounds in practice; `maxIter` caps pathological
    * chains. Each round is one shuffle join + one hash-agg over the LABEL
    * table (2 longs per node, never the documents) — no driver-side graph
    * state, so components over billions of candidate pairs are just a few
    * joins. `localCheckpoint` keeps the iterative lineage flat (the
    * classic iterative-DataFrame plan-explosion guard).
    *
    * Small-edge-set fast path — the same adaptive-threshold philosophy as
    * AQE's broadcast conversion: when BOTH id columns are integral and the
    * edge list fits a BOUNDED driver collect (`smallGraphEdges`; the 2M
    * default is ~300 MB transient driver heap with Row boxing — size like a
    * broadcast threshold), a union-find replaces O(diameter) shuffle rounds
    * with one job. Output is IDENTICAL (component = min id, as the
    * propagation loop's fixed point); PropertySpec pins the equivalence on
    * random graphs. Non-integral ids (strings, decimals) always take the
    * distributed loop, whose min-label semantics are type-agnostic — a long
    * cast would NPE on non-numeric strings and silently reorder numeric
    * ones. Pass smallGraphEdges = 0 to force the distributed loop.
    *
    * Output: (id, component) for every node appearing in `edges`. */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 20,
                          smallGraphEdges: Int = 2_000_000): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    // One persisted projection shared by the fast-path probe AND the loop's
    // symmetrised view — without it the probe's limit().collect() partially
    // evaluates the (expensive) upstream edge plan and the loop then
    // recomputes it from scratch.
    val e = edges.select(col(idA).as("u"), col(idB).as("v")).persist()
    try {
      val integralIds = Seq(idA, idB).forall { c =>
        edges.schema(c).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _                                             => false
        }
      }
      if (smallGraphEdges > 0 && integralIds) {
        val sample = e.select(col("u").cast("long"), col("v").cast("long"))
          .limit(smallGraphEdges + 1).collect()
        if (sample.length <= smallGraphEdges) {
          val parent = scala.collection.mutable.Map.empty[Long, Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
            var c = x
            while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
            r
          }
          sample.foreach { r =>
            val (a, b) = (r.getLong(0), r.getLong(1))
            parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
          }
          val spark = edges.sparkSession
          import spark.implicits._
          return parent.keys.toSeq.map(id => (id, find(id)))
            .toDF("id", "component")
        }
        // over threshold: fall through to the distributed loop
      }
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      var labels = sym.select(col("u").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint(true)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        // carry the previous label through the same aggregation (each id has
        // exactly one self row) and count label changes with an accumulator
        // DURING the eager-checkpoint job — ONE action per round, no separate
        // convergence count() pass (retries can only over-count, and we only
        // test > 0)
        val acc = edges.sparkSession.sparkContext.longAccumulator("cc_changed")
        // change detection rides a SIDE column (string-cast compare, exact
        // for a within-id-domain value) so `comp` keeps the caller's id
        // type — a Long-typed udf on comp itself would rewrite string ids
        val bump = udf { (compNew: String, prev: String) =>
          if (compNew != prev) acc.add(1L); 0
        }
        val idType = sym.schema("u").dataType
        val viaNbr = sym.join(labels, sym("v") === labels("id"))
          .select(sym("u").as("id"), col("comp"), lit(null).cast(idType).as("self"))
        val selfRows = labels.select(col("id"), col("comp"), col("comp").as("self"))
        labels = selfRows.unionByName(viaNbr)
          .groupBy("id").agg(min("comp").as("_m"), max("self").as("_prev"))
          .select(col("id"), col("_m").as("comp"),
            bump(col("_m").cast("string"), col("_prev").cast("string")).as("_chk"))
          .localCheckpoint(true)
          .select(col("id"), col("comp"))
        changed = acc.value
        iter += 1
      }
      if (changed > 0)
        System.err.println(s"[graft] connectedComponents: NOT converged after " +
          s"$maxIter rounds ($changed labels still changing) — components may " +
          s"be split; raise maxIter for graphs with diameter > $maxIter")
      labels.select(col("id"), col("comp").as("component"))
    } finally e.unpersist()
  }

  /** Winnowing-overlap candidate pairs (the MOSS plagiarism/near-dup
    * front): documents sharing ≥ `minShared` DISTINCT winnowed
    * fingerprints ([[TextStats.winnowFingerprints]] — every shared
    * substring of ≥ w+k−1 chars contributes one). Fingerprints whose
    * document frequency exceeds `maxDfFrac`·N drop before the postings
    * self-join: the RELATIVE cut (an absolute one fails both directions
    * as the corpus grows — PLANS §40) bounds each posting list at
    * `maxDfFrac`·N docs, so join cost is Σdf² over rare-only shingles
    * while boilerplate shared by everything never generates pairs.
    * Returns (id_a, id_b, shared). */
  def winnowOverlap(df: DataFrame, idCol: String, textCol: String,
                    k: Int, w: Int, minShared: Int,
                    maxDfFrac: Double): DataFrame = {
    // checkpoint the fingerprint table (id+hash rows only, no text): it
    // feeds the df-cut AND both postings sides, and re-deriving the
    // winnow generator pass three times tripled the query's cost.
    // distinct stays: the generator de-dups (pos,fp) pairs, but one doc
    // can select the same fp at several positions.
    val fps = TextStats.winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("doc"), col("fp")).distinct()
      .localCheckpoint(true)
    winnowOverlapOfFps(fps,
      df.select(countDistinct(col(idCol)).as("n_docs")), minShared, maxDfFrac)
  }

  /** [[winnowOverlap]] from a prebuilt DISTINCT (doc, fp) fingerprint
    * table and a 1-row (n_docs) frame — the memoized-subplan form
    * (PLANS §39): callers sharing the fingerprint table across several
    * queries pass it persisted so the hash+window pass is paid once.
    *
    * `prefixFilter = true` (default) applies the α-overlap prefix lemma
    * (the fixed-overlap cousin of [[jaccardPairsByIndex]]'s filter): two
    * docs sharing ≥ α fingerprints must, under ANY global fp order,
    * share one inside their (sz−α+1)-prefixes — so only each document's
    * sz−α+1 RAREST fps (df-asc order) are indexed, and candidates verify
    * exactly with a sorted-merge intersect of the full kept-fp arrays.
    * Winnow minima recur heavily across a shared-vocabulary corpus (the
    * selection is biased toward globally small hashes), so the postings
    * Σdf² is dominated by mid-df fps the prefix never indexes; the
    * measured sf0.1 shape is 5.3 M candidate rows → ~0.4 M. Output is
    * EQUAL to the exhaustive form by the lemma (property-pinned). */
  def winnowOverlapOfFps(fps: DataFrame, total: DataFrame,
                         minShared: Int, maxDfFrac: Double,
                         prefixFilter: Boolean = true): DataFrame = {
    require(minShared >= 1, s"winnowOverlap needs minShared >= 1, got $minShared")
    val kept = fps.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
      .crossJoin(broadcast(total))
      .filter(col("_df") <= col("n_docs") * maxDfFrac)
      .select(col("fp"), col("_df"))
    val posts = fps.join(kept, Seq("fp"))
    if (!prefixFilter) {
      posts.select(col("fp"), col("doc").as("id_a"))
        .join(posts.select(col("fp"), col("doc").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
    } else {
      // one hash-agg builds BOTH the df-asc ordered list (prefix source)
      // and, from the same rows, the sorted full fp array (verify side);
      // docs with < minShared kept fps can never reach the bar — dropped
      // before they generate postings. Checkpoint: the frame feeds the
      // prefix explode and both verify sides.
      val ordered = posts.groupBy(col("doc"))
        .agg(sort_array(collect_list(struct(col("_df"), col("fp")))).as("ordered"))
        .withColumn("sz", size(col("ordered")))
        .filter(col("sz") >= minShared)
        .select(col("doc"),
          expr("transform(ordered, x -> x.fp)").as("pref_fps"),
          sort_array(expr("transform(ordered, x -> x.fp)")).as("h"),
          col("sz"))
        .localCheckpoint(false)
      val pref = ordered.select(col("doc"),
        explode(slice(col("pref_fps"), lit(1),
          (col("sz") - minShared + 1).cast("int"))).as("fp"))
      val cands = pref.select(col("fp"), col("doc").as("id_a"))
        .join(pref.select(col("fp"), col("doc").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val ha = ordered.select(col("doc").as("id_a"), col("h").as("h_a"))
      val hb = ordered.select(col("doc").as("id_b"), col("h").as("h_b"))
      cands.join(ha, "id_a").join(hb, "id_b")
        .withColumn("shared", graft.functions.SortedIntersectCount
          .sortedIntersectCount(col("h_a"), col("h_b")).cast("long"))
        .filter(col("shared") >= minShared)
        .select(col("id_a"), col("id_b"), col("shared"))
    }
  }
}
