package graft

import graft.core.{Runs, Time}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomised-but-seeded property checks: the islands toolkit against a
  * brute-force reference, and resample-period algebra invariants. */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bruteRuns(mask: Seq[Boolean]): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var cur = 0
    mask.foreach { m => if (m) cur += 1 else { if (cur > 0) out += cur; cur = 0 } }
    if (cur > 0) out += cur
    out.toSeq
  }

  test("runTable matches brute-force run lengths on random masks") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rng.nextInt(60)
      val mask = Seq.fill(n)(rng.nextDouble() < 0.55)
      val df = mask.zipWithIndex.map { case (m, i) => (0L, i, if (m) 1.0 else 0.0) }
        .toDF("location_id", "t", "v")
      val got = Runs.runTable(df, Seq("location_id"), col("t"), col("v") > 0.5)
        .orderBy("run_start").collect().map(_.getAs[Long]("run_len").toInt).toSeq
      assert(got == bruteRuns(mask), s"trial $trial mask=$mask")
    }
  }

  test("resamplePeriod invariants: start <= ts < end, idempotent") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val stamps = Seq.fill(200) {
      val epoch = 800000000L + (rng.nextDouble() * 8e8).toLong // 1995..2020
      new java.sql.Timestamp(epoch * 1000L)
    }
    val df = stamps.toDF("ts")
    for (freq <- Seq("MS", "YS", "YS-JUL", "QS-DEC", "7D", "W", "D", "h", "3MS")) {
      val p = Time.resamplePeriod(col("ts"), freq)
      val bad = df.select(col("ts"), p.as("p"),
          Time.periodEnd(p, freq).as("pe"),
          Time.resamplePeriod(p, freq).as("pp"))
        .filter(!(col("p") <= col("ts") && col("ts") < col("pe") && col("p") === col("pp")))
        .count()
      assert(bad == 0, s"freq $freq violated period invariants")
    }
  }
  test("distribution quantile/cdf round-trips (GEV, Gumbel, fisk, lognorm)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.indices.Distributions
    val ps = Seq(0.05, 0.2, 0.5, 0.8, 0.95).toDF("p")
    def maxErr(c: org.apache.spark.sql.Column): Double =
      ps.select(max(abs(c - col("p")))).head.getDouble(0)
    val gev = Distributions.gevCdf(
      Distributions.gevQuantile(col("p"), lit(0.12), lit(2.0), lit(3.0)),
      lit(0.12), lit(2.0), lit(3.0))
    assert(maxErr(gev) < 1e-10)
    val gum = Distributions.gumbelCdf(
      Distributions.gumbelQuantile(col("p"), lit(2.0), lit(3.0)), lit(2.0), lit(3.0))
    assert(maxErr(gum) < 1e-10)
    val fisk = Distributions.fiskCdf(
      Distributions.fiskQuantile(col("p"), lit(3.0), lit(4.0)), lit(3.0), lit(4.0))
    assert(maxErr(fisk) < 1e-10)
    // lognorm round trip crosses probit (Acklam, |eps| < 1.15e-9) and the
    // incomplete-gamma normal CDF; tolerance reflects those approximations
    val ln = Distributions.lognormCdf(
      Distributions.lognormQuantile(col("p"), lit(0.8), lit(1.2)), lit(0.8), lit(1.2))
    assert(maxErr(ln) < 1e-7)
  }

  test("GEV L-moment fit recovers parameters from its own quantiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.indices.Distributions
    // sample = exact GEV quantiles at plotting positions -> the PWM fit
    // must recover (k, alpha, xi) closely (Hosking's approximation error)
    val (k0, a0, x0) = (0.15, 2.0, 10.0)
    val n = 2000
    val sample = (1 to n).map(i => (i - 0.35) / n)
      .map(p => x0 + a0 / k0 * (1.0 - math.pow(-math.log(p), k0)))
    val df = sample.toDF("x").agg(sort_array(collect_list(col("x"))).as("arr"))
    val (l1, l2, t3) = graft.core.Stats.lMoments(col("arr"))
    val (kk, alpha, xi) = Distributions.gevLmom(l1, l2, t3)
    val r = df.select(kk.as("k"), alpha.as("a"), xi.as("x")).head
    assert(math.abs(r.getAs[Double]("k") - k0) < 0.02, s"k = ${r.getAs[Double]("k")}")
    assert(math.abs(r.getAs[Double]("a") - a0) < 0.05)
    assert(math.abs(r.getAs[Double]("x") - x0) < 0.05)
  }

  test("Lanczos weights: symmetric, normalised, low-pass gain") {
    val w = graft.indices.Synoptic.lanczosWeights(21, 0.1)
    assert(w.length == 21)
    assert(math.abs(w.sum - 1.0) < 1e-12)
    assert(w.zip(w.reverse).forall { case (a, b) => math.abs(a - b) < 1e-15 })
    assert(w(10) == w.max) // peak at the center
  }

  test("UTCI polynomial: neutral conditions stay near air temperature") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // at mrt = tas, moderate humidity and light wind the offset is small
    val r = Seq((20.0, 0.5, 0.5, 20.0)).toDF("tas", "hurs", "wind", "mrt")
      .select(graft.indices.Utci.utci(col("tas"), col("hurs"), col("wind"), col("mrt")).as("u"))
      .head.getDouble(0)
    assert(math.abs(r - 20.0) < 3.0, s"UTCI(20C neutral) = $r")
  }

  test("quadraticFit recovers a planted parabola exactly") {
    import spark.implicits._
    // y = 3 - 2x + 0.5x² sampled at x = 0..40, y in integer halves x2
    val rows = (0 to 40).map { x =>
      (0L, x.toLong, math.round((3.0 - 2.0 * x + 0.5 * x * x) * 2).toLong)
    }.toDF("id", "x", "y2")
    val fit = graft.indices.Generic.quadraticFit(rows, Seq("id"), col("x"), col("y2")).head
    // fit is on y2 = 2y: coefficients double
    assert(math.abs(fit.getAs[Double]("a") - 6.0) < 1e-9)
    assert(math.abs(fit.getAs[Double]("b") + 4.0) < 1e-9)
    assert(math.abs(fit.getAs[Double]("c") - 1.0) < 1e-9)
  }

  test("connectedComponents agrees with union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val canon = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(i => i -> find(i.toInt).toLong).toMap
    // BOTH execution paths must agree with the reference: the bounded
    // driver fast path (default) and the distributed min-label loop
    // (forced with smallGraphEdges = 0)
    for (threshold <- Seq(2_000_000, 0)) {
      val got = graft.pipeline.Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), smallGraphEdges = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == canon.keySet, s"threshold=$threshold")
      // same partition: two nodes share a component in got iff in canon
      for (a <- got.keySet; b <- got.keySet)
        assert((got(a) == got(b)) == (canon(a) == canon(b)),
          s"$a vs $b (threshold=$threshold)")
      // canonical representative: component id IS the member minimum on
      // both paths (the propagation fixed point)
      got.groupBy(_._2).foreach { case (comp, members) =>
        assert(members.keys.min == comp, s"threshold=$threshold comp=$comp")
      }
    }
  }

  test("connectedComponents keeps string ids type-intact via the distributed loop") {
    import spark.implicits._
    // non-integral ids must skip the driver fast path (a long cast would NPE
    // on "n1" and silently renumber "10" vs "9") and keep their type+values
    val edges = Seq(("n1", "n2"), ("n2", "n3"), ("b9", "b10"), ("b10", "b2"))
      .toDF("id_a", "id_b")
    val got = graft.pipeline.Dedup.connectedComponents(edges)
    assert(got.schema("id").dataType == org.apache.spark.sql.types.StringType)
    assert(got.schema("component").dataType == org.apache.spark.sql.types.StringType)
    val m = got.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // lexicographic min representative, per the min-label fixed point
    assert(m == Map("n1" -> "n1", "n2" -> "n1", "n3" -> "n1",
      "b9" -> "b10", "b10" -> "b10", "b2" -> "b10"))
  }

  test("degenerate docs (fewer tokens than ngram) emit no near-dup pairs") {
    import spark.implicits._
    // docs with an empty shingle set share no n-gram evidence: they must
    // not be folded into one J=1.0 clone class (and the uncollapsed join's
    // 0/0=NaN pairs are equally meaningless)
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]),
      (4L, "x y z w x y z w"), (5L, "x y z w x y z w")).toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.nearDuplicates(df, "doc_id", "text",
      ngram = 3, threshold = 0.5, numHashes = 16, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSet == Set((4L, 5L, 1.0)))
    val blocked = graft.pipeline.Dedup.jaccardPairsBlocked(
      df.withColumn("blk", org.apache.spark.sql.functions.lit(1)),
      "doc_id", "text", Seq("blk"), ngram = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(blocked.toSet == Set((4L, 5L)))
  }

  test("hfQuantilesScale is bit-identical to the collect_list H&F form") {
    import spark.implicits._
    import graft.core.Stats
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(13)
    // random groups incl. ties, a null-heavy group, and an ALL-null group
    val rows = (1 to 4000).map { i =>
      val g = s"g${i % 5}"
      val v: java.lang.Double =
        if (g == "g4") null
        else if (rng.nextInt(10) == 0) null
        else math.floor(rng.nextDouble() * 50) / 2.0 // coarse grid -> ties
      (g, v)
    }
    val df = rows.toDF("k", "v")
    val ps = Seq("p90" -> 0.9, "p10" -> 0.1, "p50" -> 0.5)
    val small = df.groupBy("k")
      .agg(Stats.hfQuantile(col("v"), 0.9).as("p90"),
        Stats.hfQuantile(col("v"), 0.1).as("p10"),
        Stats.hfQuantile(col("v"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) -> (0 to 2).map(i =>
        if (r.isNullAt(i + 1)) null else r.getDouble(i + 1))).toMap
    val scale = Stats.hfQuantilesScale(df, Seq("k"), "v", ps)
      .collect().map(r => r.getString(0) -> (0 to 2).map(i =>
        if (r.isNullAt(i + 1)) null else r.getDouble(i + 1))).toMap
    assert(scale.keySet == small.keySet)
    for (k <- small.keys) assert(scale(k) == small(k), k) // bit-identical doubles
    // the auto router takes the scale plan for big groups, small for small
    val routedBig = Stats.hfQuantilesAuto(df, Seq("k"), "v", ps, smallGroupMax = 10)
      .collect().map(r => r.getString(0) -> (0 to 2).map(i =>
        if (r.isNullAt(i + 1)) null else r.getDouble(i + 1))).toMap
    for (k <- small.keys) assert(routedBig(k) == small(k), s"auto/$k")
  }

  test("hfQuantilesAuto mixed regime: per-group routing, bounded driver state, NPE guards") {
    import spark.implicits._
    import graft.core.Stats
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(29)
    // 100k tiny groups (1-3 rows) + ONE huge group + one all-null group:
    // the regime where whole-frame routing would drag every group through
    // the scale plan's O(total groups) driver collect
    val smallRows = (1 to 100_000).flatMap { g =>
      (0 until 1 + g % 3).map(i => (s"g$g", java.lang.Double.valueOf(
        math.floor(rng.nextDouble() * 40) / 4.0)))
    }
    val hugeRows = (1 to 500).map(i => ("huge", java.lang.Double.valueOf(
      math.floor(rng.nextDouble() * 40) / 4.0)))
    val nullRows = (1 to 3).map(_ => ("allnull", null.asInstanceOf[java.lang.Double]))
    val df = (smallRows ++ hugeRows ++ nullRows).toDF("k", "v")
    val ps = Seq("p90" -> 0.9, "p50" -> 0.5)
    val want = df.groupBy("k")
      .agg(Stats.hfQuantile(col("v"), 0.9).as("p90"),
        Stats.hfQuantile(col("v"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) -> (0 to 1).map(i =>
        if (r.isNullAt(i + 1)) null else r.getDouble(i + 1))).toMap
    val got = Stats.hfQuantilesAuto(df, Seq("k"), "v", ps, smallGroupMax = 100)
      .collect().map(r => r.getString(0) -> (0 to 1).map(i =>
        if (r.isNullAt(i + 1)) null else r.getDouble(i + 1))).toMap
    assert(got.keySet == want.keySet) // every group exactly once
    for (k <- want.keys) assert(got(k) == want(k), k) // bit-identical doubles
    // the scale plan refuses the many-small-groups regime instead of
    // collecting O(total groups) driver rows
    val ex = intercept[IllegalArgumentException] {
      Stats.hfQuantilesScale(df, Seq("k"), "v", ps, maxDriverGroups = 1000)
    }
    assert(ex.getMessage.contains("maxDriverGroups"))
    // empty and all-null frames: the router's max-group-size probe sees a
    // null aggregate and must take the small path, not NPE
    val empty = Seq.empty[(String, java.lang.Double)].toDF("k", "v")
    assert(Stats.hfQuantilesAuto(empty, Seq("k"), "v", ps).count() == 0)
    val allNull = nullRows.toDF("k", "v")
    val nr = Stats.hfQuantilesAuto(allNull, Seq("k"), "v", ps).collect()
    assert(nr.length == 1 && nr(0).isNullAt(1) && nr(0).isNullAt(2))
  }

  test("prefix-filtered postings join: equals exhaustive at two corpus sizes, finds frequent-only pairs") {
    import spark.implicits._
    import graft.pipeline.Dedup
    import org.apache.spark.sql.functions._
    // the recall contract the old absolute df-cut broke: df grows linearly
    // with corpus size, so any fixed cut eventually drops ALL postings.
    // The df-ordered prefix filter is lossless BY CONSTRUCTION — pin the
    // output equality against the exhaustive count-form at two corpus
    // sizes (×10 apart) over the same Zipfian generator.
    for ((n, seed) <- Seq((40, 11), (400, 13))) {
      val rng = new scala.util.Random(seed)
      val stop = Vector("the", "of", "and", "to", "in")
      def doc(): String = {
        val content = Seq.fill(6)(s"w${rng.nextInt(400)}")
        val glue = Seq.fill(6)(stop(rng.nextInt(stop.length)))
        rng.shuffle(content ++ glue).mkString(" ")
      }
      val base = (0 until n).map(_ => doc())
      // plant near-dups: clone with one token changed (shares rare 2-grams)
      val docs = base.zipWithIndex.flatMap { case (d, i) =>
        Seq((i * 10L, d)) ++ (if (i % 4 == 0)
          Seq((i * 10L + 1, d.replaceFirst("w", "v"))) else Nil)
      }.toDF("doc_id", "text").withColumn("lit1", lit(1))
      def pairs(prefix: Boolean) = Dedup.jaccardPairsByIndex(docs, "doc_id",
          "text", Seq("lit1"), ngram = 2, threshold = 0.3, prefixFilter = prefix)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = pairs(prefix = false)
      assert(exact.nonEmpty)
      assert(pairs(prefix = true) == exact,
        s"prefix filter must be lossless and exact at corpus size $n")
    }
    // a pair overlapping ONLY in ubiquitous tokens — the case the absolute
    // df-cut silently missed — is generated: the prefix of a doc always
    // contains at least one token, however frequent
    val freqOnly = (Seq((9000L, "zz zz zz"), (9001L, "zz zz zz")) ++
      (0 until 10).map(i => (9100L + i, s"zz zz filler$i")))
      .toDF("doc_id", "text").withColumn("lit1", lit(1))
    val freqPairs = Dedup.jaccardPairsByIndex(freqOnly, "doc_id", "text",
        Seq("lit1"), 2, 0.3, prefixFilter = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(freqPairs.contains((9000L, 9001L)))
    // and the filter PRUNES: per-doc prefix length |d| − ceil(t|d|) + 1
    // indexes strictly fewer postings than the full inverted index once
    // ceil(t·|d|) ≥ 2 (t = 0.3 → any doc with ≥ 4 bigrams; 12-word docs
    // here have ~11)
    val rng2 = new scala.util.Random(17)
    val longDocs = (0 until 30).map(i =>
        (i.toLong, Seq.fill(12)(s"w${rng2.nextInt(200)}").mkString(" ")))
      .toDF("doc_id", "text")
    val g = longDocs.select(col("doc_id"), array_distinct(
      graft.pipeline.TextStats.wordNgrams(col("text"), 2)).as("grams"))
    val bound = g.select(size(col("grams")).as("sz"))
      .agg(sum(col("sz")).as("full"),
        sum(col("sz") - ceil(lit(0.3) * col("sz")) + 1).as("pref")).head()
    assert(bound.getLong(1) < bound.getLong(0), "prefix must index fewer postings")
  }

  test("exact-collapse components equal uncollapsed components on a random corpus") {
    // executable form of the nearDupComponents equivalence argument:
    // collapsing equal shingle sets + star edges must give the SAME
    // partition as components over the raw verified pair list
    import spark.implicits._
    import graft.pipeline.Dedup
    val rng = new scala.util.Random(7)
    val vocab = Vector("sun", "rain", "snow", "wind", "heat", "cold", "dry", "wet")
    def doc(): String = Seq.fill(8 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val base = Seq.fill(25)(doc())
    // corpus: each base doc 1-3 exact copies + a few perturbed near-dups
    val docs = base.zipWithIndex.flatMap { case (d, i) =>
      val copies = 1 + rng.nextInt(3)
      (0 until copies).map(c => (i * 100L + c, d)) ++
        (if (rng.nextBoolean()) Seq((i * 100L + 50, d + " extra")) else Nil)
    }
    val df = docs.toDF("doc_id", "text")
    def partition(res: Array[(Long, Long)]): Set[Set[Long]] =
      res.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val uncollapsed = Dedup.connectedComponents(
      Dedup.nearDuplicates(df, "doc_id", "text", ngram = 2, threshold = 0.6,
        numHashes = 16, bands = 16).select("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val collapsed = Dedup.nearDupComponents(df, "doc_id", "text", ngram = 2,
        threshold = 0.6, numHashes = 16, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(partition(collapsed) == partition(uncollapsed))
    assert(uncollapsed.nonEmpty)
  }

  test("window weighted percentiles match a brute-force grid interpolation") {
    import spark.implicits._
    // naive reference: sort (v, w), grid = (cum - w/2)/total, bracket + lerp
    def brute(pairs: Seq[(Double, Double)], p: Double): Double = {
      val s = pairs.sortBy(x => (x._1, x._2))
      val total = s.map(_._2).sum
      val cums = s.scanLeft(0.0)(_ + _._2).tail.zip(s).map { case (c, (_, w)) => c - w / 2 }
      val grid = cums.map(_ / total)
      val below = grid.count(_ <= p)
      if (below == 0) s.head._1
      else if (below == s.length) s.last._1
      else {
        val (g0, g1) = (grid(below - 1), grid(below))
        val (v0, v1) = (s(below - 1)._1, s(below)._1)
        v0 + (p - g0) / (g1 - g0) * (v1 - v0)
      }
    }
    val rng = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      ((i % 5).toString, rng.nextDouble() * 100, (1 + rng.nextInt(4)).toDouble))
    val df = rows.toDF("g", "v", "w")
    val got = graft.ensembles.Ensembles.weightedPercentiles(
        df, Seq("g"), col("v"), col("w"), Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byG = rows.groupBy(_._1)
    for ((g, grp) <- byG; (p, i) <- Seq(0.1, 0.5, 0.9).zipWithIndex) {
      val expect = brute(grp.map(x => (x._2, x._3)), p)
      assert(math.abs(got(g)(i) - expect) < 1e-9, s"g=$g p=$p")
    }
  }

  test("hash sampling: deterministic membership, stratified size exact") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i % 7).toString)).toDF("id", "s")
    val s1 = graft.pipeline.Sampling.hashSample(df, col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    val s2 = graft.pipeline.Sampling.hashSample(df.repartition(13), col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < 300) // partitioning-invariant
    val strat = graft.pipeline.Sampling.stratifiedSample(df, Seq("s"), col("id"), 10)
      .groupBy("s").count().collect()
    assert(strat.length == 7 && strat.forall(_.getLong(1) == 10L))
  }

  test("stratifiedSampleLarge equals the window form under any partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val df = (1L to 800L).map(i => (i, (rng.nextInt(5)).toString, rng.nextDouble()))
      .toDF("id", "s", "v")
    // includes a tiny stratum ("tiny", 2 rows) to exercise k > |stratum|
    val withTiny = df.union(Seq((9001L, "tiny", 0.5), (9002L, "tiny", 0.6)).toDF("id", "s", "v"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val exact = canon(graft.pipeline.Sampling.stratifiedSample(withTiny, Seq("s"), col("id"), 7))
    for (parts <- Seq(1, 3, 17)) {
      val large = canon(graft.pipeline.Sampling.stratifiedSampleLarge(
        withTiny.repartition(parts), Seq("s"), col("id"), 7))
      assert(large == exact, s"parts=$parts")
    }
    // string ids: heap tie-break comparator must match the window ordering
    val sdf = (1 to 200).map(i => (s"doc_$i", (i % 3).toString)).toDF("sid", "s")
    val e2 = graft.pipeline.Sampling.stratifiedSample(sdf, Seq("s"), col("sid"), 4)
      .select("sid").as[String].collect().toSet
    val l2 = graft.pipeline.Sampling.stratifiedSampleLarge(sdf.repartition(11), Seq("s"), col("sid"), 4)
      .select("sid").as[String].collect().toSet
    assert(l2 == e2)
  }

  test("blocked Jaccard collapse expands clone classes exactly") {
    import spark.implicits._
    // three verbatim clones + one near-dup + one unrelated, single block:
    // within-class pairs carry J = 1; the near-dup pairs carry the SAME
    // representative J against every clone
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "b0"),
      (2L, "alpha beta gamma delta epsilon zeta", "b0"),
      (3L, "alpha beta gamma delta epsilon zeta", "b0"),
      (4L, "alpha beta gamma delta epsilon eta", "b0"),   // near-dup
      (5L, "one two three four five six", "b0")).toDF("id", "text", "blk")
    val pairs = graft.pipeline.Dedup.jaccardPairsBlocked(
        docs, "id", "text", Seq("blk"), ngram = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // clone pairs: J exactly 1
    assert(Seq((1L, 2L), (1L, 3L), (2L, 3L)).forall(p => pairs(p) == 1.0))
    // near-dup joins every clone with one identical J value
    val nd = Seq((1L, 4L), (2L, 4L), (3L, 4L)).map(pairs)
    assert(nd.distinct.size == 1 && nd.head > 0.3 && nd.head < 1.0)
    // unrelated doc pairs with nobody
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("container-metadata walks never throw on corrupt payloads (fuzz)") {
    // Same contract as the decoders: every byte pattern yields metadata or
    // null, never an exception — one malformed file must not kill a task.
    import graft.pipeline.Multimodal
    val rng = new scala.util.Random(20260814)
    def check(p: Array[Byte]): Unit = { Multimodal.mp3Meta(p); Multimodal.mp4Meta(p) }
    for (_ <- 1 to 200) check(Array.fill(rng.nextInt(400))(rng.nextInt.toByte))
    val mp3 = Multimodal.plantedMp3(5L, 40)
    val mp4 = Multimodal.plantedMp4(5L, 64, 48, 1500)
    def mutate(src: Array[Byte]): Array[Byte] = {
      val m = src.clone()
      for (_ <- 0 to rng.nextInt(4)) m(rng.nextInt(m.length)) = rng.nextInt.toByte
      m
    }
    for (_ <- 1 to 300) { check(mutate(mp3)); check(mutate(mp4)) }
    for (cut <- 1 until mp4.length) check(mp4.take(cut))
    for (cut <- 1 until mp3.length by 7) check(mp3.take(cut))
    // deep crafted nesting must hit the depth cap, not the JVM stack:
    // 100k nested moov headers, innermost holding a v0 mvhd
    val nest = new Array[Byte](100000 * 8 + 8 + 100)
    val bb = java.nio.ByteBuffer.wrap(nest)
    for (i <- 0 until 100000) {
      bb.putInt(i * 8, nest.length - i * 8); bb.put(i * 8 + 4, 'm'.toByte)
      bb.put(i * 8 + 5, 'o'.toByte); bb.put(i * 8 + 6, 'o'.toByte); bb.put(i * 8 + 7, 'v'.toByte)
    }
    assert(Multimodal.mp4Meta(nest) != null) // saw moov; walk stayed bounded
  }

  test("media decoders never throw on corrupt payloads (fuzz)") {
    // At corpus scale a decoder that throws on one malformed file kills the
    // task: every byte pattern must yield features or null, never an
    // exception. Seeded fuzz over (a) pure random bytes, (b) valid planted
    // payloads with byte flips, (c) truncations at every-ish boundary.
    import graft.pipeline.Multimodal
    val dec = new Multimodal.DefaultDecoder
    dec.open()
    val rng = new scala.util.Random(20260813)
    def check(modality: String, payload: Array[Byte]): Unit = {
      val f = dec.decode(modality, payload, 8) // must not throw
      assert(f == null || f.length == 8)
    }
    for (_ <- 1 to 200) {
      val junk = Array.fill(rng.nextInt(300))(rng.nextInt.toByte)
      check("audio", junk); check("video", junk); check("image", junk)
    }
    val wav = Multimodal.plantedWav(5L, 64, 8000, 2)
    val avi = Multimodal.plantedAvi(5L, 6, 5, 2, 25)
    for (_ <- 1 to 300) {
      def mutate(src: Array[Byte]): Array[Byte] = {
        val m = src.clone()
        for (_ <- 0 to rng.nextInt(4)) m(rng.nextInt(m.length)) = rng.nextInt.toByte
        m
      }
      check("audio", mutate(wav)); check("video", mutate(avi))
    }
    for (cut <- 1 until wav.length by 3) check("audio", wav.take(cut))
    for (cut <- 1 until avi.length by 3) check("video", avi.take(cut))
    // header-driven overflow probe: a crafted strf claiming a 2^30-px-wide
    // frame must be rejected, not read out of bounds
    val evil = avi.clone()
    // find the strf chunk and poison biWidth (offset strf_data+4)
    val idx = evil.sliding(4).indexWhere(_.sameElements("strf".getBytes))
    val wOff = idx + 8 + 4
    evil(wOff) = 0; evil(wOff + 1) = 0; evil(wOff + 2) = 0; evil(wOff + 3) = 0x40
    check("video", evil)
    assert(dec.decode("video", evil, 8) == null)
    dec.close()
  }

  test("semanticDedup triangle salting: giant cluster, output unchanged, no O(k^2) key") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val rng = new scala.util.Random(11)
    val dim = 8
    def vec(): Array[Double] = Array.fill(dim)(rng.nextGaussian())
    // one degenerate 600-row cluster (every real corpus has one) + 20
    // healthy 10-row clusters; plant near-duplicates in both: every 5th
    // row's vector is reused (scaled — same direction, cosine 1) by the
    // next row, so n_near is nonzero and threshold logic is exercised
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Array[Double])]
    var id = 0L
    def emit(cluster: String, n: Int): Unit = {
      var last: Array[Double] = null
      for (i <- 0 until n) {
        val v = if (i % 5 == 1 && last != null) last.map(_ * 1.7) else vec()
        last = v; rows += ((id, cluster, v)); id += 1
      }
    }
    emit("junk", 600)
    for (c <- 0 until 20) emit(s"c$c", 10)
    val df = rows.toSeq.toDF("id", "cluster", "v")
    val cap = 50
    val salted = Similarity.semanticDedup(df, "id", "v", "cluster", 0.99, clusterCap = cap)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val plain = Similarity.semanticDedup(df, "id", "v", "cluster", 0.99,
        clusterCap = Int.MaxValue)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(salted == plain, "salted output must equal the unsalted form")
    assert(plain.exists(_(3) == 0), "planting should produce some duplicates")
    // the skew bound itself: reconstruct the (cluster, shard-pair) join-key
    // histogram with the same formulas the implementation uses and check the
    // hottest key's candidate volume is ~cap^2, NOT k^2 = 360000
    val nshard = math.ceil(600.0 / cap).toInt // 12 shards for the junk cluster
    val perKey = df.filter($"cluster" === "junk")
      .withColumn("shard", pmod(xxhash64($"id"), lit(nshard)).cast("int"))
      .withColumn("other", explode(sequence(lit(0), lit(nshard - 1))))
      .groupBy(least($"shard", $"other"), greatest($"shard", $"other"))
      .count().collect().map(_.getLong(2))
    val maxPairsPerKey = perKey.map(n => n * n / 4).max // two sides of ~n/2 rows
    assert(perKey.length == nshard * (nshard + 1) / 2,
      "giant cluster must fan out over all shard-pair keys")
    assert(maxPairsPerKey < 4L * cap * cap,
      s"hottest key candidate volume $maxPairsPerKey should be ~cap^2, not k^2")
  }

  test("normalizeTs: identical output for NANOS-long, NTZ-micros and TIMESTAMP encodings") {
    import spark.implicits._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}
    // the three ts encodings the events generator has actually emitted.
    // Spark cannot WRITE TIMESTAMP(NANOS), so that fixture is planted with
    // the parquet-java example writer directly — the same parquet type a
    // pyarrow timestamp('ns') writer produces.
    val micros = Seq(0L, 1_700_000_000_000_000L, 1_700_000_123_456_789L,
      951_866_096_123_456L)
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_enc_")
    // (1) TIMESTAMP(NANOS, isAdjustedToUTC=false) via parquet-java; the
    // +999 ns sub-microsecond tail exercises the ns→us floor division
    locally {
      import org.apache.parquet.schema.{LogicalTypeAnnotation => LTA, Types => PTypes}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      import org.apache.parquet.hadoop.example.ExampleParquetWriter
      import org.apache.parquet.example.data.simple.SimpleGroupFactory
      val nanosSchema = PTypes.buildMessage()
        .required(PrimitiveTypeName.INT64)
        .as(LTA.timestampType(false, LTA.TimeUnit.NANOS)).named("ts")
        .named("events")
      val w = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(s"$dir/nanos/part-0.parquet"))
        .withConf(spark.sparkContext.hadoopConfiguration)
        .withType(nanosSchema).build()
      val gf = new SimpleGroupFactory(nanosSchema)
      micros.foreach(us => w.write(gf.newGroup().append("ts", us * 1000L + 999L)))
      w.close()
    }
    // (2) TIMESTAMP_NTZ (parquet MICROS, isAdjustedToUTC=false)
    micros.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dir/ntz")
    // (3) TIMESTAMP (parquet MICROS, isAdjustedToUTC=true)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$dir/tstz")
    graft.sources.Tables.enableNanosAsLong(spark)
    def readNorm(sub: String, want: org.apache.spark.sql.types.DataType): Seq[Long] = {
      val raw = spark.read.parquet(s"$dir/$sub")
      assert(raw.schema("ts").dataType == want, s"$sub surfaced as ${raw.schema("ts").dataType}")
      val norm = graft.sources.Tables.normalizeTs(raw)
      assert(norm.schema("ts").dataType == TimestampType)
      norm.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
    }
    val fromNanos = readNorm("nanos", LongType)
    val fromNtz = readNorm("ntz", TimestampNTZType)
    val fromTs = readNorm("tstz", TimestampType)
    assert(fromNanos == micros.sorted, "ns tail must floor away")
    assert(fromNtz == micros.sorted)
    assert(fromTs == micros.sorted)
  }

  test("winnowing guarantee: every shared substring >= w+k-1 chars yields a shared fingerprint") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val k = 5; val w = 8 // guarantee threshold t = w+k-1 = 12 chars
    def noise(n: Int): String =
      Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    // 20 docs embedding the SAME 30-char substring inside distinct noise:
    // winnowing must hand every one of the 190 pairs a common fingerprint
    val shared = "thequickbrownfoxjumpedoverdogs"
    assert(shared.length >= w + k - 1)
    val docs = (0 until 20).map(i => (i.toLong, noise(40) + shared + noise(40)))
      .toDF("doc_id", "text")
    val fps = graft.pipeline.TextStats
      .winnowFingerprints(docs, "doc_id", "text", k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val pairs = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(pairs == 190L, s"only $pairs of 190 pairs share a fingerprint")

    // density: selection keeps between windows/w and all positions, and
    // every document yields at least one fingerprint
    val perDoc = fps.groupBy("doc_id").count().collect()
    assert(perDoc.length == 20)
    val n = 40 + 30 + 40 // normalised length (all lowercase letters)
    val windows = (n - k + 1) - w + 1
    perDoc.foreach { r =>
      assert(r.getLong(1) >= windows / w && r.getLong(1) <= n - k + 1,
        s"doc ${r.getLong(0)}: ${r.getLong(1)} fingerprints out of bounds")
    }

    // winnowOverlap with a permissive df-cut finds every planted pair too
    val ov = graft.pipeline.Dedup
      .winnowOverlap(docs, "doc_id", "text", k, w, minShared = 1, maxDfFrac = 1.0)
      .count()
    assert(ov == 190L, s"winnowOverlap found $ov of 190 pairs")
  }

  test("winnowOverlap prefix filter equals the exhaustive postings join") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    def noise(n: Int): String =
      Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    // a corpus with graded sharing: family f's docs all embed f's motif
    // (high overlap within a family), plus one GLOBAL boilerplate motif in
    // every doc (df = N — exercised both under a permissive cut that keeps
    // it and a tight cut that drops it), plus pure-noise singletons
    val global = "commonboilerplateheaderlineforeveryone"
    val motifs = (0 until 6).map(f => noise(60))
    val docs = ((0 until 6).flatMap { f =>
      (0 until 5).map(i => ((f * 5 + i).toLong,
        noise(30) + global + noise(20) + motifs(f) + noise(30)))
    } ++ (30 until 40).map(i => (i.toLong, noise(150)))).toDF("doc_id", "text")
    val fps = graft.pipeline.TextStats
      .winnowFingerprints(docs, "doc_id", "text", 5, 8)
      .select(col("doc_id").as("doc"), col("fp")).distinct()
      .localCheckpoint(true)
    val total = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    for (minShared <- Seq(1, 3, 6); dfFrac <- Seq(0.2, 1.0)) {
      def run(prefix: Boolean) = graft.pipeline.Dedup
        .winnowOverlapOfFps(fps, total, minShared, dfFrac, prefixFilter = prefix)
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val pre = run(true); val full = run(false)
      assert(pre == full,
        s"prefix filter diverged at minShared=$minShared dfFrac=$dfFrac: " +
          s"${pre.size} vs ${full.size} pairs")
      if (minShared == 1 && dfFrac == 1.0)
        assert(pre.size >= 6 * 10, "planted families must produce pairs")
    }
  }

  test("winnowOverlap prefix bounds candidate volume under corpus-wide boilerplate") {
    import spark.implicits._
    val rng = new scala.util.Random(61)
    def noise(n: Int): String =
      Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    // every doc embeds the SAME boilerplate motif: its ~10 fps reach
    // df = N, and with a permissive cut (dfFrac = 1.0) the exhaustive
    // postings join pays >= N^2 candidate rows on each. The prefix drops
    // exactly each doc's minShared−1 MOST COMMON fps, so with minShared
    // comfortably above the boilerplate fp count the boilerplate falls
    // out of every prefix and the join runs on rare noise fps only.
    // (With minShared below that count the df CUT, not the prefix, is
    // the boilerplate guard — that regime is §57's bench case.) True
    // pairs come from 20 mutated near-copies sharing all their fps.
    val boiler = "sharedboilerplatefooterlineforalldocumentsinthecorpus"
    val n = 200
    val bodies = (0 until 180).map(_ => (noise(80), noise(80)))
    val docs = ((0 until 180).map(i =>
        (i.toLong, bodies(i)._1 + boiler + bodies(i)._2)) ++
      (0 until 20).map(i =>
        (180L + i, bodies(i)._1 + boiler + bodies(i)._2 + "tailmutation")))
      .toDF("doc_id", "text")
    val fps = graft.pipeline.TextStats
      .winnowFingerprints(docs, "doc_id", "text", 5, 8)
      .select(col("doc_id").as("doc"), col("fp")).distinct()
      .localCheckpoint(true)
    val minShared = 12
    // exhaustive join volume: sum over fps of df^2
    val fullVol = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df"))).head.getLong(0)
    // prefix join volume, rebuilt with the implementation's own ordering
    // contract (df asc, fp asc; prefix length sz - minShared + 1)
    val dfreq = fps.groupBy("fp").agg(count(lit(1)).as("_df"))
    val pref = fps.join(dfreq, "fp")
      .groupBy("doc")
      .agg(sort_array(collect_list(struct(col("_df"), col("fp")))).as("o"))
      .withColumn("sz", size(col("o")))
      .filter(col("sz") >= minShared)
      .select(col("doc"), explode(expr(
        s"slice(transform(o, x -> x.fp), 1, size(o) - ${minShared - 1})")).as("fp"))
    val prefVol = pref.groupBy("fp").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head.getLong(0)
    assert(fullVol >= n.toLong * n,
      s"boilerplate should force >= N^2 exhaustive volume, got $fullVol")
    assert(prefVol < fullVol / 5,
      s"prefix volume $prefVol should be far below exhaustive $fullVol")
    // and the outputs still agree — the 20 planted near-copies surface
    val total = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val a = graft.pipeline.Dedup
      .winnowOverlapOfFps(fps, total, minShared, 1.0, prefixFilter = true)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val b = graft.pipeline.Dedup
      .winnowOverlapOfFps(fps, total, minShared, 1.0, prefixFilter = false)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size >= 20, s"planted near-copies must pair up, got ${a.size}")
  }

  test("BpeEncode: hand-computed merge trajectories, cascades, edge cases") {
    import spark.implicits._
    import graft.functions.BpeEncode.bpeEncode
    val merges = Seq(
      ("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"), ("s", "p"),
      ("a", "r"), ("sp", "ar"), ("spar", "k"), ("r", "o"), ("ro", "w"),
      ("d", "a"), ("da", "ta"))
    def enc(s: String): Seq[String] =
      Seq(s).toDF("t").select(bpeEncode(col("t"), merges).as("o"))
        .head.getSeq[String](0)
    assert(enc("table") == Seq("table"))
    assert(enc("spark") == Seq("spark"))
    // cascade: rank 0 must fire before ranks 10/11 can
    assert(enc("data") == Seq("data"))
    assert(enc("fast") == Seq("f", "a", "s", "t"))
    // lowest rank wins over leftmost position: in "sta", (t,a) rank 0
    // beats (s,t) absent; in "star", (t,a)=0 fires before (a,r)=5 —
    // after which "ta r" is not a merge, so [s, ta, r]
    assert(enc("star") == Seq("s", "ta", "r"))
    assert(enc("table spark data") == Seq("table", "spark", "data"))
    assert(enc("  table   spark ") == Seq("table", "spark"))
    assert(enc("x") == Seq("x"))
    assert(enc("") == Seq())
    // leftmost occurrence when the same lowest-rank pair appears twice
    assert(enc("tata") == Seq("ta", "ta"))
    // non-BMP codepoints split whole (surrogate pairs must never be
    // separated — a code-unit split corrupts them into replacement bytes)
    assert(enc("😀ta😀") ==
      Seq("😀", "ta", "😀"))
    assert(enc("a😀b") == Seq("a", "😀", "b"))
  }

  test("exifMeta: planted tags recovered both-endian; truncation/mutation never throws") {
    import graft.pipeline.Multimodal
    val rng = new scala.util.Random(53)
    for (id <- 0L until 20L) { // ids cover II (even) and MM (odd)
      val jpg = Multimodal.plantedExifJpeg(id, 64, 48)
      val m = Multimodal.exifMeta(jpg)
      assert(m != null, s"id $id: EXIF not found")
      assert(m._1 == (1 + id % 8).toInt, s"id $id orientation")
      assert(m._2 == s"cam${id % 4}", s"id $id make")
      assert(m._3 == f"2026:01:${1 + id % 27}%02d ${id % 24}%02d:00:00")
      assert(m._4 == 64L, s"id $id pixel_x")
    }
    // EXIF must still be found behind 0xFF fill bytes and standalone
    // markers (TEM 0x01, RSTn) that carry no length field
    locally {
      val withApp1 = Multimodal.plantedExifJpeg(5, 64, 48)
      val inject = Array[Byte](0xFF.toByte, 0xFF.toByte, // fill padding
        0xFF.toByte, 0x01.toByte,                        // TEM, standalone
        0xFF.toByte, 0xD0.toByte)                        // RST0, standalone
      val padded = new Array[Byte](withApp1.length + inject.length)
      padded(0) = withApp1(0); padded(1) = withApp1(1)
      System.arraycopy(inject, 0, padded, 2, inject.length)
      System.arraycopy(withApp1, 2, padded, 2 + inject.length,
        withApp1.length - 2)
      val m = Multimodal.exifMeta(padded)
      assert(m != null && m._2 == "cam1", "EXIF behind standalone markers")
    }
    // plain JPEG (no APP1) and non-JPEG payloads return null
    assert(Multimodal.exifMeta(Multimodal.plantedJpeg(3, 32, 32)) == null)
    assert(Multimodal.exifMeta("not a jpeg".getBytes) == null)
    assert(Multimodal.exifMeta(null) == null)
    // fuzz: truncations and random byte flips must never read out of
    // bounds or throw — hostile offsets included
    val base = Multimodal.plantedExifJpeg(5, 64, 48)
    for (cut <- 1 until math.min(base.length, 200)) Multimodal.exifMeta(base.take(cut))
    for (_ <- 1 to 500) {
      val m = base.clone()
      for (_ <- 0 to rng.nextInt(6)) m(rng.nextInt(160)) = rng.nextInt.toByte
      Multimodal.exifMeta(m)
    }
  }

  test("ccnetBuckets cutoff path equals the ntile window form, ties included") {
    import spark.implicits._
    import graft.pipeline.TextStats
    val rng = new scala.util.Random(99)
    // heavy ties (nll on a coarse grid) + uneven language sizes, so the
    // boundary tie-break and the n%3 bucket-size rules both get exercised
    val rows = (0 until 400).map { i =>
      val lang = Seq("en", "de", "fr", "xx")(rng.nextInt(4))
      (i.toLong, lang, (rng.nextInt(12) * 0.25) + 1.0)
    } ++ Seq((9001L, "solo", 1.0)) ++ // n=1 language
      Seq((9002L, "duo", 1.0), (9003L, "duo", 1.0)) // n=2, tied
    val nll = rows.toDF("doc_id", "lang", "mean_nll")
    val viaNtile = TextStats.ccnetBucketsNtile(nll)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaCutoff = TextStats.ccnetBuckets(nll, TextStats.ccnetCutoffs(nll))
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaCutoff == viaNtile)
  }

  test("kmeansLloyd is invariant to physical partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    // three planted blobs + noise, float vectors like the live table
    val rows = (0 until 150).map { i =>
      val c = i % 3
      (i.toLong, Array.fill(8)((c * 2.0 + rng.nextGaussian() * 0.3).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    def run(parts: Int) = graft.pipeline.Similarity
      .kmeansLloyd(df.repartition(parts), "vec_id", "embedding", k = 3, iters = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val a = run(1); val b = run(7)
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.map(_._2).distinct.size == 3, "blobs should occupy 3 clusters")
    // planted structure recovered: rows of the same blob share a label
    val byBlob = a.groupBy(_._1 % 3).values.map(_.map(_._2).distinct.size)
    assert(byBlob.forall(_ == 1), "each blob should map to one cluster")
  }

  test("decontaminateBloom equals the exact join, even with a tiny saturated filter") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    def doc(words: Int): String =
      Seq.fill(words)(s"w${rng.nextInt(400)}").mkString(" ")
    val corpus = (0 until 120).map(i => (i.toLong, doc(30))).toDF("doc_id", "text")
    val bench = (0 until 15).map(i => (1000L + i, doc(25))).toDF("doc_id", "text")
    // plant contamination: docs 5,17 carry a benchmark 4-gram verbatim
    val benchRow = bench.orderBy("doc_id").collect()(0).getString(1)
    val planted = benchRow.split(" ").slice(3, 7).mkString(" ")
    val corpus2 = corpus.withColumn("text",
      when(col("doc_id").isin(5L, 17L), concat(col("text"), lit(" " + planted)))
        .otherwise(col("text")))
    val exact = graft.pipeline.Dedup
      .decontaminate(corpus2, "doc_id", "text", bench, n = 4)
      .orderBy("doc_id").collect().toSeq
    // generous filter AND a 64-bit saturated one: false positives flood the
    // prefilter, the exact verify must still produce identical output
    for (m <- Seq(1 << 16, 64)) {
      val got = graft.pipeline.Dedup
        .decontaminateBloom(corpus2, "doc_id", "text", bench, n = 4,
          mBits = m, kHashes = 3)
        .orderBy("doc_id").collect().toSeq
      assert(got == exact, s"mBits=$m diverges from exact join")
    }
    assert(exact.count(_.getBoolean(2)) >= 2, "planted contamination not flagged")
  }

  test("heavyHitters equals the exact group-by under counter-eviction pressure") {
    import spark.implicits._
    // Zipf-ish stream: a few planted heavy keys over a ~400-key tail,
    // vocabulary ~16x the sketch capacity so MG evicts constantly; the
    // sketch-prune + broadcast re-count must still equal the plain
    // group-by/HAVING row-for-row (lossless: minFrac 0.05 > 1/(k+1))
    val rng = new scala.util.Random(71)
    val keys = Seq.fill(40000) {
      val r = rng.nextInt(1000)
      if (r < 180) "alpha" else if (r < 320) "beta"
      else if (r < 380) "gamma" else if (r < 410) "delta"
      else s"t${r}"
    }
    val df = keys.toDF("token").repartition(7) // several partials to merge
    val got = graft.pipeline.TextStats.heavyHitters(df, "token", minFrac = 0.05, k = 24)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val thr = math.ceil(0.05 * keys.size).toLong
    val want = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
    assert(got == want, s"got $got, want $want")
    assert(want.nonEmpty && want.size < 8, "fixture should have a few heavy keys")
  }

  test("int8 quantisation: codes in [-127,127], reconstruction within step/2") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)((rng.nextFloat() - 0.5f) * 4f))) :+
      (99L, Array.fill(16)(0f)) // the all-zero vector: scale 0, codes 0
    val df = vecs.toDF("id", "v")
    val out = graft.pipeline.Similarity.quantizeInt8(df, "id", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toArray, r.getDouble(2)))).toMap
    for ((id, v) <- vecs) {
      val (q, s) = (out(id)._1, out(id)._2)
      if (v.forall(_ == 0f)) assert(s == 0.0 && q.forall(_ == 0L), s"zero vec $id")
      else {
        assert(q.forall(c => math.abs(c) <= 127), s"code range at $id")
        v.zip(q).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * s) <= s / 2 + 1e-12,
            s"reconstruction error at $id: $x vs ${c * s} (step $s)")
        }
        assert(q.exists(c => math.abs(c) == 127), s"max element must hit ±127 at $id")
      }
    }
  }

  test("nfc_normalize: composes decomposed sequences, idempotent, null-safe") {
    import spark.implicits._
    val decomposed = "Cafe\u0301" // Cafe + combining acute
    val composed = "Caf\u00e9"     // single-code-point e-acute
    val rows = Seq(
      (1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, null)
    ).toDF("id", "s")
    val got = rows
      .withColumn("n", graft.functions.NfcNormalize.nfcNormalize(col("s")))
      .orderBy("id").collect().map(r => Option(r.getString(2)))
    assert(got(0).contains(composed), "decomposed input must compose")
    assert(got(1).contains(composed), "composed input must pass through")
    assert(got(2).contains("plain ascii"))
    assert(got(3).isEmpty, "null must stay null")
    // idempotence over the whole column, and SQL registration
    graft.functions.GraftFunctions.register(spark)
    val sqlGot = rows.filter(col("s").isNotNull)
      .createOrReplaceTempView("nfc_rows")
    val twice = spark.sql(
      "select count(*) n from nfc_rows " +
        "where nfc_normalize(nfc_normalize(s)) <> nfc_normalize(s)")
      .collect().head.getLong(0)
    assert(twice == 0L, "nfc must be idempotent")
  }

  test("html_text: tags, script/style, comments, entities, nasty edges") {
    def x(s: String): String =
      graft.functions.HtmlText.extract(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(x("<html><body><p>hello <b>world</b></p></body></html>") ==
      "hello world")
    // script/style content dropped, case-insensitive, attrs, inner '<'
    assert(x("a<SCRIPT type=\"x\">if(1<2){b('</')}</ScRiPt>z") == "a z")
    assert(x("a<style>p{color:red}</style>b") == "a b")
    // unclosed script eats the tail (truncated crawl page)
    assert(x("keep<script>var x=1;") == "keep")
    // self-closing script does NOT eat the tail
    assert(x("a<script/>b") == "a b")
    // comments, CDATA, doctype, processing instruction
    assert(x("<!DOCTYPE html>a<!-- hidden <b>bold</b> -->b<![CDATA[ x<y ]]>c")
      == "a b c")
    // unclosed comment eats the tail
    assert(x("a<!-- open") == "a")
    // quoted '>' inside attribute does not end the tag
    assert(x("<a title=\"1 > 0\" href='q>r'>link</a>") == "link")
    // entities: named, numeric dec/hex, malformed verbatim, nbsp collapse
    assert(x("x &amp; y &lt;tag&gt; &#233;&#xE9; &nbsp; z &unknown; &") ==
      "x & y <tag> éé z &unknown; &")
    // entity-encoded markup stays TEXT (decode after strip)
    assert(x("&lt;script&gt;alert(1)&lt;/script&gt;") == "<script>alert(1)</script>")
    // lone '<' is text; whitespace collapses; trim
    assert(x("  2 < 3   and\t4\n> 1  ") == "2 < 3 and 4 > 1")
    // plain text fast path returns input unchanged
    assert(x("already plain") == "already plain")
  }

  test("html_text: expression over a DataFrame + SQL registration") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, "<p>one</p>"), (2L, null.asInstanceOf[String]),
      (3L, "<script>x</script>two &amp; three")
    ).toDF("id", "h")
    val got = df.withColumn("t", graft.functions.HtmlText.htmlText(col("h")))
      .orderBy("id").select("t").collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("one"), None, Some("two & three")))
    df.createOrReplaceTempView("html_rows")
    val viaSql = spark.sql(
      "select html_text(h) t from html_rows where id = 3").collect().head.getString(0)
    assert(viaSql == "two & three")
  }

  test("url_normalize: scheme/host/port/dot-segments/percent/query/fragment") {
    def x(s: String): String =
      graft.functions.UrlNormalize.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(x("HTTP://Example.COM:80/a/../b?q=1#top") ==
      "http://example.com/b?q=1")
    assert(x("https://example.com:443/") == "https://example.com/")
    assert(x("https://example.com:8443/x") == "https://example.com:8443/x",
      "non-default port survives")
    assert(x("https://example.com") == "https://example.com/",
      "empty path becomes /")
    // dot segments: leading .., /./, trailing /.., beyond root
    assert(x("http://h/a/./b/../c") == "http://h/a/c")
    assert(x("http://h/../../x") == "http://h/x")
    assert(x("http://h/a/b/..") == "http://h/a/")
    assert(x("http://h/a/.") == "http://h/a/")
    // percent: unreserved decodes, reserved uppercases, malformed verbatim
    assert(x("http://h/%7Euser/%2fx/%zz") == "http://h/~user/%2Fx/%zz")
    // tracking params drop; survivors sort by (key, value); dup keys stable
    assert(x("http://h/p?utm_source=a&b=2&a=1&gclid=x&a=0") ==
      "http://h/p?a=0&a=1&b=2")
    assert(x("http://h/p?utm_campaign=z") == "http://h/p",
      "all-tracking query drops its ?")
    assert(x("http://h/p?") == "http://h/p", "empty query drops")
    // '=' vs key-prefix ordering edge: key 'a' before key 'a=' param 'ab'
    assert(x("http://h/p?ab=1&a=2") == "http://h/p?a=2&ab=1")
    // userinfo passes through; fragment-only URL
    assert(x("https://u:p@Host.Org/x#frag") == "https://u:p@host.org/x")
    // non-absolute input unchanged
    assert(x("not a url") == "not a url")
    assert(x("/relative/path?b=1") == "/relative/path?b=1")
    // already-canonical fast path: same object semantics (value equality)
    assert(x("https://example.com/a?b=1") == "https://example.com/a?b=1")
  }

  test("url_normalize: DataFrame + SQL registration, null-safe, dedup use") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, "HTTP://A.com:80/x/../y?utm_source=s&k=1"),
      (2L, "http://a.com/y?k=1"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "u")
    val norm = df.withColumn("n",
      graft.functions.UrlNormalize.urlNormalize(col("u")))
    val got = norm.orderBy("id").collect().map(r => Option(r.getString(2)))
    assert(got(0) == got(1), "the two spellings canonicalize identically")
    assert(got(2).isEmpty)
    val distinct = norm.filter(col("n").isNotNull)
      .select("n").distinct().count()
    assert(distinct == 1L)
    df.createOrReplaceTempView("url_rows")
    assert(spark.sql("select count(distinct url_normalize(u)) c from url_rows")
      .collect().head.getLong(0) == 1L)
  }

  test("domainQuota: spelling variants share one host bucket; k caps per host") {
    import spark.implicits._
    // hosts h0/h1 under three URL spellings; 6 docs per host, quota 2
    val rows = (0 until 12).map { i =>
      val host = s"h${i % 2}"
      val u = (i / 2) % 3 match {
        case 0 => s"HTTP://$host.EXAMPLE.ORG:80/p/$i"
        case 1 => s"http://$host.example.org/x/../p/$i?utm_s=1"
        case _ => s"http://$host.example.org/p/$i"
      }
      (i.toLong, u, 100 - i) // score strictly decreasing in i
    }.toDF("id", "u", "score")
    val kept = graft.pipeline.Sampling.domainQuota(
      rows, col("u"), 2, Seq(col("score").desc, col("id").asc))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L, 3L),
      s"top-2 per host by score = ids 0-3, got ${kept.toSeq}")
    // quota larger than any host passes everything through
    val all = graft.pipeline.Sampling.domainQuota(
      rows, col("u"), 100, Seq(col("id").asc)).count()
    assert(all == 12L)
  }

  test("dsirScores: evidence sums match brute force; target-like docs score higher") {
    import spark.implicits._
    // target topic = "cat dog"; off-topic = "ore rock"; doc 5 mixes
    val docs = Seq(
      (0L, "cat dog cat", true), (1L, "dog cat dog dog", true),
      (2L, "ore rock ore", false), (3L, "rock ore rock rock", false),
      (4L, "cat dog dog cat", false), (5L, "cat rock", false)
    ).toDF("doc_id", "text", "want_t")
    val got = graft.pipeline.TextStats.dsirScores(
        docs, "doc_id", "text", col("want_t"), buckets = 64)
      .collect().map(r => r.getAs[Long]("doc") -> r).toMap
    assert(got.size == 6)
    // brute force: bucket = md5-prefix mod 64 per token
    def bucket(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val toks = Seq((0L, "cat dog cat", true), (1L, "dog cat dog dog", true),
      (2L, "ore rock ore", false), (3L, "rock ore rock rock", false),
      (4L, "cat dog dog cat", false), (5L, "cat rock", false))
      .flatMap { case (id, tx, t) => tx.split("\\s+").map(w => (id, bucket(w), t)) }
    val cntT = toks.filter(_._3).groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val cntR = toks.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    for (id <- 0L to 5L) {
      val mine = toks.filter(_._1 == id)
      assert(got(id).getAs[Long]("n_tokens") == mine.size.toLong)
      assert(got(id).getAs[Long]("target_evidence") ==
        mine.map(x => cntT.getOrElse(x._2, 0L)).sum, s"target evidence doc $id")
      assert(got(id).getAs[Long]("raw_evidence") ==
        mine.map(x => cntR(x._2)).sum, s"raw evidence doc $id")
    }
    // per-token log weight orders docs by target-likeness
    def perTok(id: Long) =
      got(id).getAs[Double]("log_weight") / got(id).getAs[Long]("n_tokens")
    assert(perTok(4L) > perTok(5L) && perTok(5L) > perTok(2L),
      s"on-topic ${perTok(4L)} > mixed ${perTok(5L)} > off-topic ${perTok(2L)}")
  }

  test("RobotsMatch: RFC 9309 pattern semantics") {
    val m = graft.functions.RobotsMatch.matches _
    // plain prefix
    assert(m("/fish/salmon", "/fish"))
    assert(m("/fishing", "/fish"))
    assert(!m("/Fish", "/fish"), "matching is case-sensitive per RFC")
    // * wildcard
    assert(m("/foox/bar", "/foo*bar"))
    assert(m("/foobar", "/foo*bar"))
    assert(m("/foobarx", "/foo*bar"), "prefix continues past the match")
    assert(!m("/fo/bar", "/foo*bar"))
    assert(m("/a/b.tmp", "/*.tmp"))
    // $ anchor
    assert(m("/fish", "/fish$"))
    assert(!m("/fishing", "/fish$"))
    assert(m("/a/b.tmp", "/*.tmp$"))
    assert(!m("/a/b.tmpx", "/*.tmp$"))
    // star tails and backtracking
    assert(m("/abc", "/a*c$"))
    assert(!m("/abcx", "/a*c$"))
    assert(m("/anything", "/*"))
    assert(m("/", "/*"))
    assert(m("/aXbXc", "/a*b*c"))
    assert(!m("/acb", "/a*b*c"))
  }

  test("Robots: group parse, agent selection, decision precedence") {
    import spark.implicits._
    val body =
      """# crawl policy
        |User-agent: evilbot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /private/
        |Allow: /private/pub/
        |Disallow: /*.tmp$
        |Crawl-delay: 10
        |Disallow:
        |""".stripMargin
    val parsed = graft.pipeline.Robots.parseRules(body)
    assert(parsed.contains(("evilbot", false, "/")))
    assert(parsed.contains(("*", false, "/private/")))
    assert(parsed.contains(("*", true, "/private/pub/")))
    assert(!parsed.exists(_._3 == ""), "empty Disallow emits no rule")

    val robots = Seq(("h1", body)).toDF("host", "body")
    // evilbot gets its exact group only: everything blocked
    val evil = graft.pipeline.Robots.rulesFor(robots, "EvilBot")
    assert(evil.collect().map(_.getString(2)).toSeq == Seq("/"))
    // other agents fall through to *
    val rules = graft.pipeline.Robots.rulesFor(robots, "graftbot")
    assert(rules.count() == 3)

    val urls = Seq(
      (1L, "http://h1/public/x"),       // no rule -> allowed
      (2L, "http://h1/private/x"),      // /private/ -> blocked
      (3L, "http://h1/private/pub/x"),  // longer Allow wins -> allowed
      (4L, "http://h1/tmp/f.tmp"),      // /*.tmp$ -> blocked
      (5L, "http://other.example/whatever") // unknown host -> allowed
    ).toDF("id", "u")
    val kept = graft.pipeline.Robots.filterAllowed(urls, col("u"), rules)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 5L), s"got ${kept.toSeq}")
    val none = graft.pipeline.Robots.filterAllowed(urls, col("u"), evil)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(none.toSeq == Seq(5L), "evilbot may fetch nothing on h1")
  }

  test("CharsetSniff: BOMs, utf-8 validation, latin-1, binary, windowing") {
    def s(bytes: Array[Byte]): String = graft.functions.CharsetSniff.sniff(bytes)
    def ascii(t: String): Array[Byte] = t.getBytes("US-ASCII")
    assert(s(ascii("plain text\nwith lines\t.")) == "ascii")
    assert(s("héllo wörld 世界".getBytes("UTF-8")) == "utf-8")
    assert(s(Array(0xEF, 0xBB, 0xBF, 'h', 'i').map(_.toByte)) == "utf-8-bom")
    assert(s(Array(0xFE, 0xFF, 0, 'h').map(_.toByte)) == "utf-16")
    assert(s(Array(0xFF, 0xFE, 'h', 0).map(_.toByte)) == "utf-16")
    assert(s("café".getBytes("ISO-8859-1")) == "latin-1")
    // bare continuation byte and invalid lead
    assert(s(Array('a', 0x80, 'b').map(_.toByte)) == "latin-1")
    assert(s(Array('a', 0xC0, 0xAF).map(_.toByte)) == "latin-1", "overlong lead C0")
    // overlong 3-byte (E0 80..9F) and surrogate (ED A0..) reject
    assert(s(Array(0xE0, 0x80, 0x80).map(_.toByte)) == "latin-1")
    assert(s(Array(0xED, 0xA0, 0x80).map(_.toByte)) == "latin-1")
    // 4-byte emoji is valid utf-8
    assert(s("ok 😀".getBytes("UTF-8")) == "utf-8")
    // NUL and control-heavy content
    assert(s(Array('P', 'K', 0, 1).map(_.toByte)) == "binary")
    assert(s(Array.fill[Byte](100)(0x01)) == "binary")
    // truncated trailing multibyte at payload end is NOT valid utf-8
    val cut = "é".getBytes("UTF-8").take(1) // lone C3
    assert(s(ascii("abc") ++ cut) == "latin-1")
    assert(s(Array.emptyByteArray) == "ascii")
    // expression + SQL registration over a DataFrame
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "plain"), (2L, "café")).toDF("id", "t")
      .withColumn("b", when(col("id") === 1, col("t").cast("binary"))
        .otherwise(encode(col("t"), "ISO-8859-1")))
    val got = df.withColumn("cs",
        graft.functions.CharsetSniff.charsetSniff(col("b")))
      .orderBy("id").select("cs").collect().map(_.getString(0))
    assert(got.toSeq == Seq("ascii", "latin-1"))
  }

  test("charTrigrams + langId: trigram edges, profile determinism, argmax") {
    import spark.implicits._
    val df = Seq((1L, "abcde"), (2L, "ab"), (3L, ""), (4L, "xyz"))
      .toDF("id", "t")
    val tris = df.withColumn("g", graft.pipeline.TextStats.charTrigrams(col("t")))
      .orderBy("id").collect().map(_.getSeq[String](2))
    assert(tris(0) == Seq("abc", "bcd", "cde"))
    assert(tris(1).isEmpty && tris(2).isEmpty, "short strings yield none")
    assert(tris(3) == Seq("xyz"))

    // two 'languages' with disjoint trigram vocab; classify held-out text
    val corpus = Seq(
      ("aa", "abc abc abd"), ("aa", "abc abd abd"),
      ("bb", "xyz xyw xyz"), ("bb", "xyw xyz xyw")
    ).toDF("lang", "text")
    val prof = graft.pipeline.TextStats.langIdProfiles(corpus, "lang", "text", k = 5)
    assert(prof.count() == 10, "5 per language")
    val test = Seq((10L, "abc abd"), (11L, "xyz xyw"), (12L, "qqq qqq"))
      .toDF("doc_id", "text")
    val pred = graft.pipeline.TextStats
      .langIdClassify(test, "doc_id", "text", prof)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred.get(10L).contains("aa") && pred.get(11L).contains("bb"))
    assert(!pred.contains(12L), "no overlap with any profile -> no row")
  }

  test("HtmlLinks: hrefs in order, attrs/quotes/entities, no script/comment links") {
    def links(s: String): Seq[String] = {
      val a = graft.functions.HtmlLinks.links(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    assert(links("""<a href="/x">a</a><a class='k' href='/y?a=1&amp;b=2'>b</a>""") ==
      Seq("/x", "/y?a=1&b=2"))
    assert(links("""<A HREF=/bare>up</A>""") == Seq("/bare"),
      "case-insensitive tag/attr, unquoted value")
    assert(links("""<a name="no">x</a><area href="/not-a"/>""") == Nil)
    assert(links("""<!-- <a href="/c">c</a> --><script>let a='<a href="/s">'</script>""") ==
      Nil, "comment and script bodies emit nothing")
    assert(links("""<a title="1 > 0" href="/q">x</a>""") == Seq("/q"),
      "quoted > inside another attribute")
    assert(links("""<a href="">e</a><a href>f</a>""") == Nil,
      "empty and valueless hrefs drop")
  }

  test("pageRankExact equals an integer reference fold on a small graph") {
    import spark.implicits._
    // 6 nodes; node 5 dangling; parallel edge 0->1 twice; self-loop 4->4
    val edges = Seq(0L -> 1L, 0L -> 1L, 1L -> 2L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 2L -> 5L).toDF("src", "dst")
    val got = graft.pipeline.Graph
      .pageRankExact(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: same integer recurrence, plain Scala
    val es = Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L),
      (4L, 4L), (2L, 5L))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val od = es.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 4) {
      val cs = es.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map(e => r(e._1) / od(e._1)).sum
      }
      r = nodes.map(v => v -> (150000000L + 85L * cs.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(got == r, s"spark $got vs reference $r")
    // node 3 has no inbound edges: base mass only
    assert(got(3L) == 150000000L)
  }

  test("html_anchors: (href, text) pairs; nested markup, implied close, EOF tail") {
    def pairs(s: String): Seq[(String, String)] = {
      val a = graft.functions.HtmlLinks.anchors(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      }
    }
    assert(pairs("""<a href="/x">hello <b>bold</b> world</a>""") ==
      Seq("/x" -> "hello bold world"))
    assert(pairs("""<a href="/1">one</a> mid <a href='/2'>t&amp;wo</a>""") ==
      Seq("/1" -> "one", "/2" -> "t&wo"))
    // implied close: second <a> closes the first
    assert(pairs("""<a href="/a">first <a href="/b">second</a>""") ==
      Seq("/a" -> "first", "/b" -> "second"))
    // EOF inside an anchor keeps the tail text
    assert(pairs("""<a href="/cut">tail text""") == Seq("/cut" -> "tail text"))
    // href-less anchors contribute nothing, even with text
    assert(pairs("""<a name="n">skip</a>""") == Nil)
    // empty anchor text is kept (image links)
    assert(pairs("""<a href="/img"><img src="i.png"/></a>""") == Seq("/img" -> ""))
  }

  test("compressionRatio: repetitive text compresses far below varied text") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val varied = Seq.fill(400)(rng.alphanumeric.take(6).mkString).mkString(" ")
    val df = Seq(
      (1L, "spam " * 500), (2L, varied), (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val got = df.withColumn("cr",
        graft.pipeline.TextStats.compressionRatio(col("t")))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(got(0).get < 0.05, s"pure repetition ~0: ${got(0)}")
    assert(got(1).get > 0.5, s"random text stays high: ${got(1)}")
    assert(got(2).isEmpty && got(3).isEmpty, "empty/null -> null")
  }

  test("epochShuffle: exact permutation, rerun-deterministic, epoch-distinct") {
    import spark.implicits._
    val ids = (1L to 500L).toDF("id").repartition(7) // position must not
    val perm = (ep: Int) => graft.pipeline.Sampling // depend on layout
      .epochShuffle(ids, col("id"), ep)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e1 = perm(1)
    assert(e1.map(_._2).sorted.toSeq == (0L until 500L), "exact 0..n-1 cover")
    assert(perm(1).toMap == e1.toMap, "bit-reproducible on rerun")
    val e2 = perm(2).toMap
    assert(e1.count { case (id, p) => e2(id) == p } < 50,
      "epochs 1 and 2 must be (nearly) disjoint permutations")
  }

  test("temperatureMixture: alpha=1 keeps all, alpha=0 equalizes, 0.5 tempers") {
    import spark.implicits._
    import graft.pipeline.Sampling
    // three groups, 4000/1000/250 rows — exact 4:1 ratios so the tempered
    // expectations are clean
    val df = ((0 until 4000).map(i => (i.toLong, "big")) ++
      (4000 until 5000).map(i => (i.toLong, "mid")) ++
      (5000 until 5250).map(i => (i.toLong, "small")))
      .toDF("id", "grp")
    assert(Sampling.temperatureMixture(df, "grp", col("id"), alpha = 1.0)
      .count() == 5250) // alpha=1: rates all 1
    val eq = Sampling.temperatureMixture(df, "grp", col("id"), alpha = 0.0)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0: every group targets the smallest size (binomial noise ~±6%)
    assert(eq("small") == 250)
    assert(math.abs(eq("big") - 250) < 50 && math.abs(eq("mid") - 250) < 50, eq.toString)
    val tm = Sampling.temperatureMixture(df, "grp", col("id"), alpha = 0.5)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0.5: rate_i = sqrt(n_min/n_i) -> big 0.25, mid 0.5, small 1
    assert(tm("small") == 250)
    assert(math.abs(tm("big") - 1000) < 120 && math.abs(tm("mid") - 500) < 90, tm.toString)
    // a tiny NULL-key group must NOT set the feasibility minimum (review
    // finding): rates are unchanged and the null rows are dropped
    val withNulls = df.unionByName(
      (90000 until 90003).map(i => (i.toLong, null: String)).toDF("id", "grp"))
    val nm = Sampling.temperatureMixture(withNulls, "grp", col("id"), alpha = 0.5)
      .groupBy("grp").count().collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(!nm.contains(None), "null-key rows must be dropped")
    assert(nm(Some("small")) == 250 && nm(Some("mid")) == tm("mid"), nm.toString)
  }

  test("msgpack encode/decode round-trips random nested value trees") {
    import graft.sources.Msgpack
    import graft.sources.Msgpack._
    val rng = new scala.util.Random(7)
    def randStr(n: Int): String =
      Seq.fill(n)("aβ語x ".charAt(rng.nextInt(5))).mkString
    def gen(depth: Int): MValue = rng.nextInt(if (depth > 0) 7 else 6) match {
      case 0 => MNull
      case 1 => MBool(rng.nextBoolean())
      case 2 => MLong(rng.nextLong() >> rng.nextInt(64)) // spans all widths
      case 3 => MDouble(rng.nextDouble() * math.pow(10, rng.nextInt(20) - 10))
      case 4 => MStr(randStr(rng.nextInt(40)))
      case 5 =>
        val b = new Array[Byte](rng.nextInt(40)); rng.nextBytes(b); MBin(b)
      case _ => MArr(Vector.fill(rng.nextInt(6))(gen(depth - 1)))
    }
    def same(a: MValue, b: MValue): Boolean = (a, b) match {
      case (MBin(x), MBin(y))   => java.util.Arrays.equals(x, y)
      case (MArr(x), MArr(y))   => x.length == y.length && x.zip(y).forall((same _).tupled)
      case (x, y)               => x == y
    }
    for (trial <- 1 to 200) {
      val v = gen(3)
      assert(same(Msgpack.decode(Msgpack.encode(v), s"trial$trial"), v), s"trial $trial: $v")
    }
    // width-boundary pins, incl. the 32-bit formats (review finding: the
    // 16-bit encoder used to truncate lengths above 65535 silently)
    for (n <- Seq(31, 32, 255, 256, 65535, 65536, 70000)) {
      val s = MStr("x" * n)
      assert(same(Msgpack.decode(Msgpack.encode(s), s"str$n"), s), s"str len $n")
      val b = MBin(Array.fill(n)((n % 251).toByte))
      assert(same(Msgpack.decode(Msgpack.encode(b), s"bin$n"), b), s"bin len $n")
    }
    val bigArr = MArr(Vector.fill(65537)(MLong(1)))
    assert(same(Msgpack.decode(Msgpack.encode(bigArr), "arr65537"), bigArr))
  }

  test("overlapJoin: banded result equals brute force on random intervals; bad intervals reject") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(19)
    val as = (1 to 400).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, i.toLong % 5, s, s + 1 + rnd.nextInt(700)) }
    val bs = (1 to 400).map { i =>
      val s = rnd.nextInt(10000).toLong
      (1000L + i, i.toLong % 7 % 5, s, s + 1 + rnd.nextInt(40)) }
    val a = as.toDF("id", "k", "s", "e")
    val b = bs.toDF("id", "k", "s", "e")
    // brute force over the cross product
    val brute = (for {
      (ai, ak, as0, ae0) <- as; (bi, bk, bs0, be0) <- bs
      if ak == bk && as0 < be0 && bs0 < ae0
    } yield (ai, bi)).toSet
    for (band <- Seq(16L, 100L, 1024L, 100000L)) {
      val got = graft.core.Intervals
        .overlapJoin(a, b, Seq("k"), "s", "e", band)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"band=$band emitted duplicates")
      assert(got.toSet === brute, s"band=$band mismatch")
    }
    intercept[Throwable] {
      graft.core.Intervals.overlapJoin(
        Seq((1L, 0L, 10L, 10L)).toDF("id", "k", "s", "e"),
        b, Seq("k"), "s", "e", 16L).collect()
    }
  }

  test("triangleCount: hand pins (K4, path, duplicates/loops) and random brute force") {
    import spark.implicits._
    def count(es: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = pipeline.Graph.triangleCount(
        es.toDF("src", "dst"), "src", "dst").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // K4: 4 triangles; duplicates, reversals and self-loops collapse
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(k4) === ((4L, 6L, 4L)))
    assert(count(k4 ++ k4.map(e => (e._2, e._1)) ++ Seq((2L, 2L))) ===
      ((4L, 6L, 4L)))
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === ((4L, 3L, 0L)))
    // random graph vs brute force over vertex triples
    val rnd = new scala.util.Random(3)
    val es = Seq.fill(120)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .filter(e => e._1 != e._2)
    val set = es.map(e => (e._1 min e._2, e._1 max e._2)).toSet
    val verts = set.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      i <- verts.indices; j <- (i + 1) until verts.size
      k <- (j + 1) until verts.size
      if set((verts(i), verts(j))) && set((verts(j), verts(k))) &&
        set((verts(i), verts(k)))
    } yield 1).size.toLong
    assert(count(es) === ((verts.size.toLong, set.size.toLong, brute)))
  }

  test("weightedSample: matches JVM ES replay exactly; deterministic; rejects w<=0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1L to 500L).map(i => (i, "g" + (i % 2), (i % 9 + 1).toDouble))
    val df = rows.toDF("id", "grp", "w")
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    // JVM replay of the exact column math
    def pr(id: Long, w: Double): Double = {
      val h = java.lang.Long.parseLong(md5hex(s"${id}graft").take(13), 16)
      val u = (h + 0.5) / 4503599627370496.0
      math.floor(math.log(u) * 1e6 + 0.5) / w
    }
    val expect = rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.sortBy(r => (-pr(r._1, r._3), r._1)).take(7)
    }.map(_._1).toSet
    val got = pipeline.Sampling.weightedSample(df, Seq("grp"), col("id"),
      col("w"), 7).select("id").as[Long].collect().toSet
    assert(got === expect)
    val got2 = pipeline.Sampling.weightedSample(df.repartition(17),
      Seq("grp"), col("id"), col("w"), 7)
      .select("id").as[Long].collect().toSet
    assert(got2 === expect, "membership stable under repartitioning")
    // zero/negative weights fail loudly, never silently skew
    intercept[Throwable] {
      pipeline.Sampling.weightedSample(
        Seq((1L, "g", 0.0)).toDF("id", "grp", "w"),
        Seq("grp"), col("id"), col("w"), 1).collect()
    }
  }

  test("Robots crawl-delay: group selection, max-of-applicable, scheduler slots") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val body =
      """User-agent: evilbot
        |Crawl-delay: 99
        |
        |User-agent: graftbot
        |Crawl-delay: 2
        |Crawl-delay: 5
        |
        |User-agent: *
        |Crawl-delay: 30
        |Disallow: /x
        |""".stripMargin
    // exact group governs (both its delays, max wins); * is ignored
    assert(graft.pipeline.Robots.parseCrawlDelays(body).toSet ===
      Set(("evilbot", 99.0), ("graftbot", 2.0), ("graftbot", 5.0), ("*", 30.0)))
    val robots = Seq(("h1", body),
      ("h2", "User-agent: *\nDisallow: /p\n"), // no delay stated
      ("h3", "User-agent: *\nCrawl-delay: not-a-number\nCrawl-delay: 1.5\n"))
      .toDF("host", "body")
    val delays = graft.pipeline.Robots.crawlDelays(robots, "graftbot")
      .as[(String, Double)].collect().toMap
    assert(delays === Map("h1" -> 5.0, "h3" -> 1.5))
    // scheduler: FIFO slots per host, default covers h2
    val urls = Seq(("h1", 1L), ("h1", 2L), ("h1", 3L), ("h2", 4L),
      ("h2", 5L), ("h3", 6L), ("h3", 7L)).toDF("h", "id")
    val sched = graft.pipeline.Robots.schedule(urls, col("h"), col("id"),
        delays = graft.pipeline.Robots.crawlDelays(robots, "graftbot"),
        startMs = 1000L, defaultDelayS = 2.0)
      .select("h", "id", "slot", "fetch_at_ms")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(sched.toSeq === Seq(
      ("h1", 1L, 0L, 1000L), ("h1", 2L, 1L, 6000L), ("h1", 3L, 2L, 11000L),
      ("h2", 4L, 0L, 1000L), ("h2", 5L, 1L, 3000L),
      ("h3", 6L, 0L, 1000L), ("h3", 7L, 1L, 2500L)))
  }

  test("DDSketch bucket kernel: monotone in |x|, covers x within gamma width") {
    // JVM-side replay of the column math — same ops, same grid
    val g = 19803L
    def bucket(x: Double): Long = {
      val l = math.floor(math.log(math.abs(x)) * 1e6 + 0.5).toLong
      val pm = ((l % g) + g) % g
      ((l - pm).toDouble / g).toLong
    }
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(math.exp(rnd.nextGaussian() * 4.0)).sorted
    // monotone: sorted inputs give non-decreasing buckets
    val bs = xs.map(bucket)
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b })
    val gamma = math.exp(g / 1e6)
    xs.foreach { x =>
      val b = bucket(x)
      // x ∈ [γ^b, γ^(b+1)) up to the 1e-6 ln-grid slack at the edges
      val lo = math.pow(gamma, b.toDouble) * (1 - 2e-6)
      val hi = math.pow(gamma, b.toDouble + 1) * (1 + 2e-6)
      assert(x >= lo && x < hi, s"x=$x bucket=$b range=[$lo,$hi)")
    }
  }

  test("Morton2: z-curve locality — same quadrant iff same key prefix") {
    val rnd = new scala.util.Random(11)
    (1 to 2000).foreach { _ =>
      val (x1, y1) = (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)
      val (x2, y2) = (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)
      val (z1, z2) = (graft.functions.Morton2.compute(x1, y1),
        graft.functions.Morton2.compute(x2, y2))
      // top 2 z-bits == the two coordinates' top bits: same key prefix
      // exactly when both points share the 2x2 top-level quadrant
      val sameQuadrant = (x1 >> 15) == (x2 >> 15) && (y1 >> 15) == (y2 >> 15)
      assert(((z1 >> 30) == (z2 >> 30)) == sameQuadrant,
        s"($x1,$y1) vs ($x2,$y2)")
      // and the interleave is invertible: de-interleave recovers inputs
      def even(z: Long): Long = (0 until 16)
        .map(i => ((z >> (2 * i)) & 1L) << i).sum
      assert(even(z1) == x1 && even(z1 >> 1) == y1)
    }
  }
}
