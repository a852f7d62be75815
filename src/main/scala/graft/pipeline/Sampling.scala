package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Every operator here
  * is RNG-free: the sample is a pure function of (row identity, salt), so
  * it is reproducible across runs, retries, partitionings and cluster
  * sizes — the property that makes 100 TB pipeline re-runs and A/B data
  * ablations auditable. (Spark's `df.sample` is seed-stable only for a
  * fixed partitioning; these are stable, period.)
  */
object Sampling {

  /** Uniform [0,1) fraction from a salted md5 of the row id — the shared
    * primitive. First 13 hex digits = 52 bits, exactly representable in a
    * double, identically computable in any SQL engine. */
  def hashFraction(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0) // 2^52

  /** Bernoulli(p) sample: keep rows whose hash fraction < p. One scan, no
    * shuffle, deterministic membership. */
  def hashSample(df: DataFrame, id: Column, p: Double, salt: String = "graft"): DataFrame =
    df.filter(hashFraction(id, salt) < p)

  /** Deterministic EPOCH SHUFFLE — the global reorder every training run
    * applies per epoch: each row's position is its rank under a salted
    * md5 of (epoch, id), so the permutation is (a) uniform, (b) a pure
    * function of (seed, epoch, id) — any worker, any rerun, any engine
    * reproduces it bit-for-bit, the property that makes checkpointed
    * training resumable — and (c) different every epoch without any
    * state. Returns the input plus `shuffle_pos` (0-based).
    *
    * Scale shape: ONE total sort by the hash key — Spark's range
    * partitioner samples the (uniform) keys, so partitions are balanced
    * by construction and the sort is the classic 100 TB epoch-shuffle
    * job. Positions come from a two-pass per-partition-count + offset
    * scheme, NOT a global window (`row_number() over (order by …)`
    * funnels the corpus through one reducer) — and the whole plan stays
    * DataFrame-side (r12): local index = `monotonically_increasing_id`
    * minus the partition's minimum (consecutive within a partition by
    * construction), global base per partition from one tiny aggregate,
    * glued back with a broadcast hash join. No RDD detour, so the
    * position-assign pass keeps whole-stage codegen and the columnar
    * exchange format. Hash ties break by id. */
  def epochShuffle(df: DataFrame, id: Column, epoch: Int,
                   salt: String = "graft"): DataFrame = {
    val keyC = "__graft_shuffle_key"; val pidC = "__graft_pid"
    val midC = "__graft_mid"; val baseC = "__graft_base"
    for (c <- Seq("shuffle_pos", keyC, pidC, midC, baseC))
      require(!df.columns.contains(c),
        s"epochShuffle: input already has a column named '$c' " +
          "(reserved for the output position / internal scratch)")
    val spark = df.sparkSession
    import spark.implicits._
    val key = md5(concat(lit(salt), lit(":"), lit(epoch), lit(":"),
      id.cast("string")))
    // localCheckpoint pins partitioning and the non-deterministic ids so
    // the count pass and the join read identical rows
    val sorted = df.withColumn(keyC, key)
      .repartitionByRange(col(keyC), id)
      .sortWithinPartitions(col(keyC), id)
      .withColumn(pidC, spark_partition_id())
      .withColumn(midC, monotonically_increasing_id())
      .localCheckpoint(false)
    // pass 1: (rows, min id) per partition — one row per partition on the
    // driver. Range partitions are in key order, so pid order IS global
    // order; base(pid) maps the partition-local id run onto [offset, …).
    val perPart = sorted.groupBy(col(pidC))
      .agg(count(lit(1)).as("_n"), min(col(midC)).as("_m"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var cum = 0L
    val bases = perPart.map { case (pid, n, m) =>
      val b = cum - m; cum += n; (pid, b)
    }.toSeq
    // pass 2: broadcast the per-partition bases (≤ shuffle-partitions
    // rows) and add — stays in codegen end to end
    sorted.join(broadcast(bases.toDF(pidC, baseC)), Seq(pidC))
      .withColumn("shuffle_pos", col(baseC) + col(midC))
      .select(df.columns.map(col) :+ col("shuffle_pos"): _*)
  }

  /** Temperature-scaled rebalance — the multilingual-pretraining mixture
    * rule (sample share p_i ∝ n_i^alpha, alpha ∈ [0,1]; mC4/XLM-R style):
    * derive per-key keep rates from the OBSERVED counts,
    * rate_i = min(1, t·n_i^alpha/n_i) with t = min_j n_j^(1-alpha) — the
    * smallest group is kept whole and larger groups are downsampled
    * toward the tempered share (alpha=1 keeps everything, alpha=0
    * equalizes group sizes). Wholly in-plan: one count aggregate, a
    * 1-row feasibility broadcast, a broadcast rates join, salted-md5
    * membership — the [[mixtureSample]] scaffold with weights computed
    * from the data instead of a driver-side target map.
    *
    * Rows with a NULL key are dropped (they can never match the rates
    * join) and excluded from the feasibility minimum.
    *
    * alpha = 0.5 is computed via `sqrt` (IEEE-exact, so an external
    * oracle replays rates bit-identically); other alphas go through
    * `pow`, whose last-ulp behavior is libm-specific — fine for
    * production sampling, not for hash-exact replay. */
  def temperatureMixture(df: DataFrame, keyCol: String, id: Column,
                         alpha: Double, salt: String = "graft-temp"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val cnt = col("_cnt").cast("double")
    val w =
      if (alpha == 0.5) sqrt(cnt)
      else if (alpha == 0.0) lit(1.0)
      else if (alpha == 1.0) cnt
      else pow(cnt, lit(alpha))
    // NULL keys: the membership join below can never match them, so they
    // are dropped from the OUTPUT by construction — they must also be
    // dropped from the COUNTS, or a tiny NULL group would set the
    // feasibility minimum t and crush every real group's keep rate
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("_cnt"))
      .withColumn("_w", w)
    val tRow = counts.select(min(cnt / col("_w")).as("_t"))
    val rates = counts.crossJoin(broadcast(tRow))
      .select(col(keyCol),
        least(lit(1.0), col("_t") * col("_w") / cnt).as("_rate"))
    df.join(broadcast(rates), Seq(keyCol))
      .filter(hashFraction(id, salt) < col("_rate"))
      .drop("_rate")
  }

  /** Stratified fixed-size sample: exactly min(k, |stratum|) rows per
    * stratum, chosen by hash rank (ties impossible modulo md5 collisions).
    * One shuffle on the stratum key; the window sort spills, so strata of
    * any size stay memory-bounded. For k << |stratum| at extreme scale,
    * pre-filter with `hashSample` at a safe over-rate first to shrink the
    * sort input. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], id: Column, k: Int,
                       salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashFraction(id, salt), id)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k).drop("_rk")
  }

  /** Weighted sampling WITHOUT replacement per stratum (Efraimidis &
    * Spirakis 2006, IPL 97(5): keep the k rows with the largest
    * u^(1/w), u ~ U(0,1)) — the quality-weighted corpus subsample: a
    * document with twice the weight has twice the odds at every draw,
    * and membership is a pure function of (id, salt) — stable under
    * repartitioning and retries like every sampler here.
    *
    * Engine-exact ordering: ranking by u^(1/w) equals ranking by
    * ln(u)/w, so each row's priority is ONE IEEE division L/w of the
    * micro-grid ln (L = floor(ln(u)·1e6 + 0.5) — the qln discipline;
    * no pow, no raw libm in the comparator, and an external engine
    * replays every priority bit-for-bit). u is strictly positive by
    * construction ((h + 0.5)/2^52 over the 52-bit md5 prefix), ties
    * break on the id. Weights must be > 0 — asserted columnar, loud.
    * One window per stratum — the shuffle any exact top-k pays. */
  def weightedSample(df: DataFrame, strata: Seq[String], id: Column,
                     weight: Column, k: Int,
                     salt: String = "graft"): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    for (c <- Seq("_pr", "_rk"))
      require(!df.columns.contains(c),
        s"weightedSample reserves column name '$c'")
    val wOk = when(assert_true(weight > lit(0.0),
      lit("weightedSample needs strictly positive weights")).isNull,
      weight.cast("double"))
    val u = (conv(substring(md5(concat(id.cast("string"), lit(salt))),
      1, 13), 16, 10).cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val pr = (floor(log(u) * lit(1e6) + lit(0.5)) / wOk).as("_pr")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("_pr").desc, id)
    df.withColumn("_pr", pr)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k).drop("_rk", "_pr")
  }

  /** Deterministic train/val/test split assignment: each row lands in the
    * split whose cumulative-fraction band contains its salted-md5 hash
    * fraction. Membership is a pure function of (id, salt) — stable
    * under repartitioning, retries, incremental corpus growth (a new row
    * never moves an old one) — and the band thresholds accumulate with
    * plain double addition so an external engine folding the same
    * literals lands every boundary identically. One scan, no shuffle. */
  def splitAssign(df: DataFrame, id: Column,
                  splits: Seq[(String, Double)],
                  salt: String = "graft-split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0), s"bad splits $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val f = hashFraction(id, salt)
    // all but the last split get an explicit upper bound; the last is the
    // otherwise-branch so float dust on the final threshold can't drop rows
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cum).foldLeft(None: Option[Column]) {
      case (acc, ((name, _), hi)) =>
        val c = f < hi
        Some(acc.map(_.when(c, name)).getOrElse(when(c, name)))
    }
    val expr = assigned.map(_.otherwise(splits.last._1))
      .getOrElse(lit(splits.last._1))
    df.withColumn("split", expr)
  }

  /** Mixture (data-mixing) sample — rebalance a multi-source corpus to
    * TARGET proportions, the standard step before training-mix assembly:
    * `target` maps a key (source, language, …) to its desired share of
    * the output. The largest feasible total is T = min over keys of
    * count/share (the binding key keeps everything); each key then keeps
    * a deterministic Bernoulli(T·share/count) hash sample. Keys absent
    * from `target` are dropped.
    *
    * Fully in-plan: per-key counts, the feasibility minimum (one-row
    * frame) and the per-key rates compose as broadcast joins — no
    * driver-side counting — and membership is the salted-md5 fraction,
    * so the mix is reproducible under any partitioning or retry. */
  def mixtureSample(df: DataFrame, keyCol: String, id: Column,
                    target: Map[String, Double],
                    salt: String = "graft-mix"): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = target.toSeq.toDF(keyCol, "_target")
    val joined = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_cnt"))
      .join(tgt, Seq(keyCol))
    val tRow = joined.select(min(col("_cnt") / col("_target")).as("_t"))
    val rates = joined.crossJoin(broadcast(tRow))
      .select(col(keyCol),
        least(lit(1.0), col("_t") * col("_target") / col("_cnt")).as("_rate"))
    df.join(broadcast(rates), Seq(keyCol))
      .filter(hashFraction(id, salt) < col("_rate"))
      .drop("_rate")
  }

  /** [[stratifiedSample]] for k << |stratum|: PROVABLY identical output,
    * but the stratum-keyed shuffle carries at most k·numPartitions rows per
    * stratum instead of the whole stratum. Phase 1 keeps each partition's
    * k lowest hash ranks per stratum with a bounded heap (any global top-k
    * row is top-k within its own partition, so no qualifying row is lost —
    * TakeOrderedAndProject generalized per stratum); phase 2 is the exact
    * window over survivors. Executor memory is O(k · strata-per-partition);
    * use the plain window form when k is large or strata are tiny. */
  def stratifiedSampleLarge(df: DataFrame, strata: Seq[String], id: Column, k: Int,
                            salt: String = "graft"): DataFrame = {
    val withRank = df.withColumn("_hf", hashFraction(id, salt))
      .withColumn("_id", id)
    val schema = withRank.schema
    val hfIdx = schema.fieldIndex("_hf")
    val idIdx = schema.fieldIndex("_id")
    val strataIdx = strata.map(schema.fieldIndex)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pruned = withRank.mapPartitions { rows =>
      // id tie-break must match the window's NATIVE column ordering (ties
      // only occur on md5 collisions, but exactness must not depend on that)
      def cmpAny(a: Any, b: Any): Int = (a, b) match {
        case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
        case (x: Int, y: Int)       => Integer.compare(x, y)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y)
        case (x: String, y: String) => x.compareTo(y)
        case _                      => a.toString.compareTo(b.toString)
      }
      type Entry = (Double, Any, org.apache.spark.sql.Row)
      val entryOrd: Ordering[Entry] = (x: Entry, y: Entry) => {
        val c = java.lang.Double.compare(x._1, y._1)
        if (c != 0) c else cmpAny(x._2, y._2)
      }
      // per-stratum bounded MAX-heap on (hash fraction, id): O(k) state each
      val heaps = scala.collection.mutable.Map
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[Entry]]
      rows.foreach { r =>
        val key = strataIdx.map(r.get)
        val h = heaps.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty[Entry](entryOrd))
        val entry: Entry = (r.getDouble(hfIdx), r.get(idIdx), r)
        if (h.size < k) h.enqueue(entry)
        else if (entryOrd.lt(entry, h.head)) { h.dequeue(); h.enqueue(entry) }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }(enc)
    val w = Window.partitionBy(strata.map(col): _*).orderBy(col("_hf"), col("_id"))
    pruned.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
      .drop("_rk", "_hf", "_id")
  }

  /** Per-domain quota — the crawl-pipeline guard against a handful of
    * hosts dominating the corpus: canonicalize the URL
    * ([[graft.functions.UrlNormalize]]), extract the host, keep the top
    * `k` rows per host by `order` (pass deterministic tie-breaks — e.g.
    * quality desc, doc id asc). One shuffle on the host key; the window
    * sort spills, so mega-hosts stay memory-bounded. At extreme scale
    * pre-trim each host with `hashSample` at a safe over-rate first,
    * exactly like [[stratifiedSample]]. */
  def domainQuota(df: DataFrame, urlCol: Column, k: Int,
                  order: Seq[Column]): DataFrame = {
    require(k > 0 && order.nonEmpty, "domainQuota needs k > 0 and an order")
    val host = regexp_extract(
      graft.functions.UrlNormalize.urlNormalize(urlCol),
      "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    val w = Window.partitionBy(col("_host")).orderBy(order: _*)
    df.withColumn("_host", host)
      .withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
      .drop("_rk", "_host")
  }

  /** Capped proportional token-budget allocation (water-filling) — the
    * training-mix planner's core step: given per-source availability
    * `cntCol` and a global token budget, find the level t such that
    * giving every source min(c_i, t) spends the budget, then hand the
    * integer remainder to the largest sources one token each. Exactly
    * the allocation a data-mix tuner applies before [[mixtureSample]]
    * draws the per-source rows.
    *
    * Pure integer math end to end (level, remainder, allocations), so
    * the plan is engine-exact. Ties in c_i share one trigger decision
    * (the criterion is constant across a tie group), and the remainder
    * goes to the largest (c desc, key desc) sources — all deterministic.
    *
    * Scale shape: this runs on the per-SOURCE table (thousands of rows
    * for a web corpus, never corpus-sized), so the single unpartitioned
    * window sort is bounded by source cardinality; `budget` rides a
    * one-row broadcast. Output: (key, c, alloc, capped).
    */
  def waterFill(counts: DataFrame, keyCol: String, cntCol: String,
                budget: DataFrame): DataFrame = {
    val w = Window.orderBy(col("c"), col("k"))
    val base = counts
      .select(col(keyCol).as("k"), col(cntCol).cast("long").as("c"))
      .crossJoin(broadcast(budget.select(col("budget").cast("long").as("b"))))
      .withColumn("i", row_number().over(w))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
    // first row where filling everyone from here up to its c overshoots
    val trigger = base
      .filter(col("cum") - col("c") + (col("n") - col("i") + 1) * col("c")
        > col("b"))
      .agg(min_by(struct(col("i"), (col("cum") - col("c")).as("below"),
        col("n"), col("b")), col("i")).as("s"))
      .select(col("s.i").as("i_star"),
        expr("(s.b - s.below) DIV (s.n - s.i + 1)").as("t"),
        expr("(s.b - s.below) % (s.n - s.i + 1)").as("rem"))
    base.crossJoin(broadcast(trigger))
      .select(col("k").as(keyCol), col("c"),
        when(col("i_star").isNull || col("i") < col("i_star"), col("c"))
          .otherwise(col("t") +
            when(col("n") - col("i") + 1 <= col("rem"), 1L).otherwise(0L))
          .as("alloc"),
        when(col("i_star").isNotNull && col("i") >= col("i_star"), 1)
          .otherwise(0).as("capped"))
  }
}
