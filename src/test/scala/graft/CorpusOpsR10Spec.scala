package graft

import graft.functions.AhoCorasick
import graft.pipeline.BpeTrain
import graft.sources.Lake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 corpus-hygiene / lake-maintenance operators: the
  * Aho–Corasick blocklist scan, BPE merge learning, and MERGE upsert. */
class CorpusOpsR10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- Aho–Corasick ------------------------------------------------

  /** Brute-force overlapping position scan — the oracle's form. */
  private def brute(text: String, pats: Seq[String]): (Long, Int) = {
    val perPat = pats.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }
    (perPat.map(_.toLong).sum, perPat.count(_ > 0))
  }

  test("automaton equals brute-force position scan on random corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc "
    (1 to 50).foreach { _ =>
      val nPat = 1 + rnd.nextInt(8)
      val pats = Iterator.continually(
          (1 to (1 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(4))).mkString)
        .distinct.take(nPat).toSeq
      val ac = new AhoCorasick(pats.toArray)
      (1 to 20).foreach { _ =>
        val text = (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(4))).mkString
        assert(ac.scan(text) === brute(text, pats), s"pats=$pats text='$text'")
      }
    }
  }

  test("non-ASCII patterns take the sorted-edge path, same semantics") {
    val rnd = new scala.util.Random(13)
    val alphabet = "aé日∀ " // mixes ASCII, latin-1, CJK, math (all BMP)
    (1 to 30).foreach { _ =>
      val pats = Iterator.continually(
          (1 to (1 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(5))).mkString)
        .distinct.take(1 + rnd.nextInt(6)).toSeq
      val ac = new AhoCorasick(pats.toArray)
      (1 to 15).foreach { _ =>
        val text = (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(5))).mkString
        assert(ac.scan(text) === brute(text, pats), s"pats=$pats text='$text'")
      }
    }
  }

  test("overlap and suffix-pattern semantics (dict links)") {
    assert(new AhoCorasick(Array("aa")).scan("aaa") === ((2L, 1)))
    // all three fire at position 2 via the dict-suffix chain
    assert(new AhoCorasick(Array("abc", "bc", "c")).scan("abc") === ((3L, 3)))
    assert(new AhoCorasick(Array("ab", "ba")).scan("abab") === ((3L, 2)))
    assert(new AhoCorasick(Array("x")).scan("") === ((0L, 0)))
  }

  test("acScan expression emits the struct through codegen") {
    import spark.implicits._
    val out = Seq("spark agg spark", "nothing here", null)
      .toDF("t")
      .select(AhoCorasick.acScan(col("t"), Seq("spark", "agg")).as("ac"))
      .select(col("ac.total_hits"), col("ac.distinct_hits"))
      .collect()
    assert(out(0).getLong(0) === 3L && out(0).getInt(1) === 2)
    assert(out(1).getLong(0) === 0L && out(1).getInt(1) === 0)
    assert(out(2).isNullAt(0))
  }

  // ---- BPE training ------------------------------------------------

  test("learnMerges reproduces the hand-computed merge sequence") {
    import spark.implicits._
    // words: "aa" x2, "ab" x1 -> pairs (a,a)=2 (a,b)=1 -> merge (a,a)
    // then only (a,b)=1 remains -> merge (a,b); then exhausted
    val docs = Seq("aa ab", "aa").toDF("text")
    val m = BpeTrain.learnMerges(docs, "text", 5)
      .orderBy("it").collect()
    assert(m.length === 2)
    assert(m(0).getInt(0) === 1 && m(0).getString(1) === "a" &&
      m(0).getString(2) === "a" && m(0).getLong(3) === 2L && m(0).getLong(4) === 2L)
    assert(m(1).getInt(0) === 2 && m(1).getString(1) === "a" &&
      m(1).getString(2) === "b" && m(1).getLong(3) === 1L && m(1).getLong(4) === 1L)
  }

  test("merge application is greedy left-to-right (runs collapse pairwise)") {
    import spark.implicits._
    // "aaaa": pairs (a,a)=3; merging a+a greedily gives [aa][aa], so the
    // second round must see (aa,aa)=1 — not (a,aa) leftovers
    val docs = Seq("aaaa").toDF("text")
    val m = BpeTrain.learnMerges(docs, "text", 2).orderBy("it").collect()
    assert(m(0).getString(1) === "a" && m(0).getString(2) === "a" &&
      m(0).getLong(3) === 3L)
    assert(m(1).getString(1) === "aa" && m(1).getString(2) === "aa" &&
      m(1).getLong(3) === 1L)
  }

  test("incremental pair counts equal an in-memory reference trainer") {
    import spark.implicits._
    def refBpe(words: Seq[String], k: Int): Seq[(String, String, Long, Long)] = {
      var state: Map[Vector[String], Long] = words.groupBy(identity)
        .map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
      val out = Seq.newBuilder[(String, String, Long, Long)]
      var it = 0
      var done = false
      while (it < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        state.foreach { case (syms, c) =>
          var i = 0
          while (i + 1 < syms.length) {
            counts((syms(i), syms(i + 1))) =
              counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
            i += 1
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((l, r, c, counts.size.toLong))
          state = state.toSeq.map { case (syms, c) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), c)
          }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
          it += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(59)
    (1 to 4).foreach { _ =>
      val words = (1 to 60).map(_ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => "abcd"(rnd.nextInt(4))).mkString)
      val got = BpeTrain.learnMerges(Seq(words.mkString(" ")).toDF("text"),
          "text", 8).orderBy("it")
        .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
      val want = refBpe(words, 8)
      assert(got === want, s"words=$words")
    }
  }

  // ---- native shingle generator -------------------------------------

  test("shingleExplode equals explode(charShingles) incl. multi-byte text") {
    import spark.implicits._
    val texts = Seq("hello world", "ab", "abcde", "", "héllo wörld é",
      "日本語のテキストです", "a  b\t c", null)
    val df = texts.toDF("text")
    def norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val viaGen = df.select(graft.functions.ShingleExplode
        .shingleExplode(norm, 5).as("sh"))
      .collect().map(_.getString(0)).sorted.toSeq
    val viaHof = df.select(explode(
        graft.pipeline.TextStats.charShingles(col("text"), 5)).as("sh"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(viaGen === viaHof)
    assert(viaGen.nonEmpty)
  }

  test("rollingHashExplode equals posexplode(kgramHashes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val texts = (1 to 30).map(_ => (1 to rnd.nextInt(80))
      .map(_ => "abz019 ?!É"(rnd.nextInt(10))).mkString) :+ "" :+ "ab"
    val df = texts.toDF("text")
    val viaGen = df.select(graft.functions.RollingHashExplode
        .rollingHashExplode(
          graft.pipeline.TextStats.winnowNormalize(col("text")), 4)
        .as(Seq("p0", "h")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val viaHof = df.select(posexplode(
        graft.pipeline.TextStats.kgramHashes(col("text"), 4))
        .as(Seq("p0", "h")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(viaGen === viaHof)
    assert(viaGen.nonEmpty)
    // distinct mode == explode(array_distinct(...))
    val viaGenD = df.select(graft.functions.ShingleExplode
        .shingleExplode(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
          3, distinct = true).as("sh"))
      .collect().map(_.getString(0)).sorted.toSeq
    val viaHofD = df.select(explode(array_distinct(
        graft.pipeline.TextStats.charShingles(col("text"), 3))).as("sh"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(viaGenD === viaHofD)
  }

  test("native winnowNormalize equals the regex form (incl. Kelvin/dotted-I)") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    val alphabet = "aZ 09!?,é日Kİ\t" // incl. U+212A KELVIN
    val texts = (1 to 300).map(_ =>
      (1 to rnd.nextInt(50)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString) ++ Seq("", "   ", "  !a b!  ", "Kİ", null)
    val df = texts.toDF("text")
    val native = df.select(graft.pipeline.TextStats
      .winnowNormalize(col("text")).as("v")).collect().map(r => r.getString(0))
    val regex = df.select(graft.pipeline.TextStats
      .winnowNormalizeSql(col("text")).as("v")).collect().map(r => r.getString(0))
    assert(native.toSeq === regex.toSeq)
  }

  test("native lowerCollapseWs equals the regex form") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val alphabet = "aZ \t\n\r09!é日"
    val texts = (1 to 300).map(_ =>
      (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString) ++ Seq("", " \t ", "\ta  b\nc\t", null)
    val df = texts.toDF("text")
    val native = df.select(graft.functions.WinnowNormalize
      .lowerCollapseWs(col("text")).as("v")).collect().map(_.getString(0))
    val regex = df.select(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      .as("v")).collect().map(_.getString(0))
    assert(native.toSeq === regex.toSeq)
  }

  test("winnowExplode generator equals the windowed winnowing plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // shared-substring structure (repeated slices) + degenerate rows:
    // empty, shorter than k, exactly one full window, multi-byte chars
    val base = (1 to 400).map(_ => "abz019 xq"(rnd.nextInt(9))).mkString
    val texts = (1 to 25).map { i =>
      val a = rnd.nextInt(300); val b = a + 20 + rnd.nextInt(80)
      (i.toLong, base.substring(a, b) + " É? " + base.substring(rnd.nextInt(200)))
    } ++ Seq((100L, ""), (101L, "ab"), (102L, "abcdefghijkl"), (103L, null))
    val df = texts.toDF("doc_id", "text")
    for ((k, w) <- Seq((5, 8), (4, 2), (2, 12))) {
      val gen = graft.pipeline.TextStats
        .winnowFingerprints(df, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      val win = graft.pipeline.TextStats
        .winnowFingerprintsWindowed(df, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(gen === win, s"k=$k w=$w")
      assert(gen.nonEmpty, s"k=$k w=$w produced no fingerprints")
    }
  }

  // ---- HLL sketch --------------------------------------------------

  test("HLL registers are order-free: identical under repartitioning") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => ("g", s"value_$i")).toDF("grp", "v")
    val a = pipeline.Sketches.hllRegisters(vals, "grp", "v")
      .orderBy("bucket").collect().toSeq
    val b = pipeline.Sketches.hllRegisters(vals.repartition(7), "grp", "v")
      .orderBy("bucket").collect().toSeq
    assert(a === b)
  }

  test("HLL estimate lands near truth; small range takes linear counting") {
    import spark.implicits._
    val big = (1 to 3000).map(i => ("big", s"x$i")) ++
      (1 to 20).map(i => ("small", s"y$i"))
    val df = big.toDF("grp", "v")
    val est = pipeline.Sketches.hllEstimate(
        pipeline.Sketches.hllRegisters(df, "grp", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getInt(5))).toMap
    val (bigEst, bigBranch) = est("big")
    val (smallEst, smallBranch) = est("small")
    assert(bigBranch === 0 && math.abs(bigEst - 3000) / 3000.0 < 0.15,
      s"raw estimate $bigEst")
    assert(smallBranch === 1 && math.abs(smallEst - 20) / 20.0 < 0.3,
      s"lc estimate $smallEst")
  }

  // ---- water-filling budget allocation -----------------------------

  private def fill(counts: Seq[(String, Long)], b: Long): Map[String, (Long, Int)] = {
    import spark.implicits._
    val df = counts.toDF("src", "c")
    val budget = Seq(b).toDF("budget")
    graft.pipeline.Sampling.waterFill(df, "src", "c", budget)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
  }

  test("waterFill spends the budget exactly and caps only the largest") {
    // c = 10, 20, 70; B = 40 -> level t = floor((40-10)/2) = 15, rem 0:
    // a=10 keeps all, b and c cap at 15
    assert(fill(Seq(("a", 10L), ("b", 20L), ("c", 70L)), 40L) ===
      Map("a" -> (10L, 0), "b" -> (15L, 1), "c" -> (15L, 1)))
    // remainder goes to the largest: B = 41 -> t=15 rem 1 -> c gets 16
    assert(fill(Seq(("a", 10L), ("b", 20L), ("c", 70L)), 41L) ===
      Map("a" -> (10L, 0), "b" -> (15L, 1), "c" -> (16L, 1)))
    // budget >= total: nobody capped
    assert(fill(Seq(("a", 10L), ("b", 20L)), 100L) ===
      Map("a" -> (10L, 0), "b" -> (20L, 0)))
    // everything capped: B=7, n=3 -> t=2 rem 1, largest tie gets +1
    assert(fill(Seq(("a", 5L), ("b", 5L), ("c", 5L)), 7L) ===
      Map("a" -> (2L, 1), "b" -> (2L, 1), "c" -> (3L, 1)))
  }

  test("waterFill allocation sums to min(budget, total) on random inputs") {
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val counts = (1 to 2 + rnd.nextInt(10))
        .map(i => (s"s$i", 1L + rnd.nextInt(100).toLong))
      val total = counts.map(_._2).sum
      val b = 1L + rnd.nextInt((1.3 * total).toInt).toLong
      val got = fill(counts, b)
      assert(got.values.map(_._1).sum === math.min(b, total),
        s"counts=$counts b=$b got=$got")
      got.foreach { case (k, (a, _)) =>
        assert(a <= counts.toMap.apply(k), s"over-allocated $k in $got") }
    }
  }

  // ---- Count-Min sketch --------------------------------------------

  test("CMS estimates upper-bound exact counts; exact at collision-free width") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vals = (1 to 3000).map(_ => ("g", s"v${rnd.nextInt(120)}"))
    val df = vals.toDF("grp", "v")
    val truth = vals.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
    val probes = (0 until 10).map(i => s"v$i") :+ "absent"
    // narrow sketch: estimates must never under-count
    val narrow = graft.pipeline.Sketches.cmsEstimate(
        graft.pipeline.Sketches.cmsCounters(df, "grp", "v", 4, 32),
        probes, 4, 32)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    probes.foreach { p =>
      assert(narrow(p) >= truth.getOrElse(p, 0L), s"under-count at $p") }
    // wide sketch: 120 values in 4x8192 cells -> collisions vanishingly
    // rare; estimates equal exact counts
    val wide = graft.pipeline.Sketches.cmsEstimate(
        graft.pipeline.Sketches.cmsCounters(df, "grp", "v", 4, 8192),
        probes, 4, 8192)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    probes.foreach { p =>
      assert(wide(p) === truth.getOrElse(p, 0L), s"wide mismatch at $p") }
  }

  test("CMS counters are order-free: identical under repartitioning") {
    import spark.implicits._
    val df = (1 to 2000).map(i => ("g", s"x${i % 57}")).toDF("grp", "v")
    val a = graft.pipeline.Sketches.cmsCounters(df, "grp", "v")
      .orderBy("d", "idx").collect().toSeq
    val b = graft.pipeline.Sketches.cmsCounters(df.repartition(9), "grp", "v")
      .orderBy("d", "idx").collect().toSeq
    assert(a === b)
  }

  // ---- sketch merge algebra -----------------------------------------

  test("sketch merges equal the sketch of the concatenated input") {
    import spark.implicits._
    import graft.pipeline.Sketches
    val rnd = new scala.util.Random(19)
    val all = (1 to 4000).map(_ => ("g", s"m${rnd.nextInt(900)}"))
    val (h1, h2) = all.splitAt(1700) // overlapping halves
    val (d1, d2, dAll) = (h1.toDF("grp", "v"), h2.toDF("grp", "v"),
      all.toDF("grp", "v"))
    def rows(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.head, cols.tail: _*).orderBy(cols.map(col): _*)
        .collect().toSeq
    assert(rows(Sketches.hllMerge(Sketches.hllRegisters(d1, "grp", "v"),
        Sketches.hllRegisters(d2, "grp", "v")), "grp", "bucket", "r") ===
      rows(Sketches.hllRegisters(dAll, "grp", "v"), "grp", "bucket", "r"))
    assert(rows(Sketches.cmsMerge(Sketches.cmsCounters(d1, "grp", "v"),
        Sketches.cmsCounters(d2, "grp", "v")), "grp", "d", "idx", "counter") ===
      rows(Sketches.cmsCounters(dAll, "grp", "v"), "grp", "d", "idx", "counter"))
    assert(rows(Sketches.kmvMerge(Sketches.kmvMins(d1, "grp", "v"),
        Sketches.kmvMins(d2, "grp", "v")), "grp", "hv") ===
      rows(Sketches.kmvMins(dAll, "grp", "v"), "grp", "hv"))
  }

  // ---- KMV bottom-k sketch ------------------------------------------

  test("KMV overlap is exact below k and tracks Jaccard above k") {
    import spark.implicits._
    // below k: sketches hold the full sets -> exact Jaccard
    val small = ((1 to 60).map(i => ("a", s"v$i")) ++
      (31 to 90).map(i => ("b", s"v$i"))).toDF("grp", "v")
    val s1 = graft.pipeline.Sketches.kmvOverlap(
        graft.pipeline.Sketches.kmvMins(small, "grp", "v", 128),
        Seq(("a", "b")), 128).collect().head
    assert(s1.getLong(2) === 90L) // n_kept = |union|
    assert(s1.getLong(4) === 30L) // n_common = |intersection|
    assert(s1.getDouble(5) === 30.0 / 90.0)
    // above k: 2000-element sets with 50% overlap, k=128
    val big = ((1 to 2000).map(i => ("a", s"x$i")) ++
      (1001 to 3000).map(i => ("b", s"x$i"))).toDF("grp", "v")
    val s2 = graft.pipeline.Sketches.kmvOverlap(
        graft.pipeline.Sketches.kmvMins(big, "grp", "v", 128),
        Seq(("a", "b")), 128).collect().head
    val trueJ = 1000.0 / 3000.0
    assert(math.abs(s2.getDouble(5) - trueJ) < 0.12,
      s"jaccard ${s2.getDouble(5)} vs $trueJ")
    assert(math.abs(s2.getDouble(6) - 3000) / 3000.0 < 0.2,
      s"union est ${s2.getDouble(6)}")
  }

  // ---- integer-GD logistic regression ------------------------------

  test("trainLogReg matches an independent scalar simulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = (1 to 40).map { _ =>
      val x1 = rnd.nextInt(41) - 20L
      (1L, x1, rnd.nextInt(21) - 10L, if (x1 >= 0) 1L else 0L)
    }
    val df = data.toDF("x0", "x1", "x2", "y")
    val got = graft.pipeline.QualityModel
      .trainLogReg(df, Seq("x0", "x1", "x2"), "y", iters = 4, lrShift = 3)
      .orderBy("it").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

    // independent replay of the documented contract
    var w = Array(0L, 0L, 0L)
    val n = data.length.toLong
    val exp = Seq.newBuilder[(Int, Long, Long, Long, Long, Long)]
    def pass(): (Array[Long], Long) = {
      val g = Array(0L, 0L, 0L); var nc = 0L
      data.foreach { case (x0, x1, x2, y) =>
        val z = w(0) * x0 + w(1) * x1 + w(2) * x2
        val p = math.floor(1.0 / (1.0 + math.exp(-(z.toDouble / 1e6))) * 1e6
          + 0.5).toLong
        val d = p - y * 1000000L
        g(0) += d * x0; g(1) += d * x1; g(2) += d * x2
        if ((z > 0) == (y == 1)) nc += 1
      }
      (g, nc)
    }
    (1 to 4).foreach { it =>
      val (g, nc) = pass()
      w = Array.tabulate(3)(j => w(j) - g(j) / (n << 3))
      exp += ((it, w(0), w(1), w(2), nc, n))
    }
    val (_, ncF) = pass()
    exp += ((5, w(0), w(1), w(2), ncF, n))
    assert(got === exp.result())
    // and the separable label is actually learned
    assert(got.last._5 >= (0.9 * n).toLong, s"final accuracy row ${got.last}")
  }

  // ---- incremental dedup against a persisted index -------------------

  test("incrementalCandidates equals exhaustive batch-vs-corpus pairs") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val rnd = new scala.util.Random(23)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc() = Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (1L to 40L).map(i => (i, doc()))
    // plant near-dups across the split: batch ids are multiples of 10
    val planted = Seq(
      (10L, base.find(_._1 == 3L).get._2),                       // J = 1
      (20L, base.find(_._1 == 7L).get._2 + " extra tail"),       // high J
      (30L, doc()))                                              // unrelated
    val docs = (base.filterNot(d => planted.exists(_._1 == d._1)) ++ planted)
      .toDF("id", "text")
    val corpus = docs.filter($"id" % 10 =!= 0)
    val batch = docs.filter($"id" % 10 === 0)
    val idx = Dedup.fingerprintIndex(corpus, "id", "text")
    val got = Dedup.incrementalCandidates(idx,
        Dedup.bandTable(idx.select(col("id"), col("grams"))), batch, "id", "text")
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    // exhaustive truth over the same gram definition
    val gramsOf = docs.select($"id",
        graft.pipeline.TextStats.ngramsOfTokens(
          graft.pipeline.TextStats.tokens($"text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.distinct.toSet)
    val exp = (for {
      (nid, _) <- planted ++ Seq.empty
      n = gramsOf(nid)
      (oid, o) <- gramsOf if oid % 10 != 0
      j = n.intersect(o).size.toDouble / n.union(o).size
      if j >= 0.7
    } yield (nid, oid)).toSet
    assert(got === exp)
    assert(got.contains((10L, 3L)) && got.contains((20L, 7L)))
  }

  // ---- Lake.merge --------------------------------------------------

  test("diff labels inserted/deleted/updated/unchanged against merge output") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "a", 11.0), (3L, "c", 30.0), (9L, "z", 90.0))
      .toDF("k", "s", "v")
    val got = Lake.diff(before, after, "k")
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "updated", 2L -> "deleted",
      3L -> "unchanged", 9L -> "inserted"))
  }

  test("MERGE equals an in-memory reference on random change batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    (1 to 8).foreach { _ =>
      val target = (1L to 30L).map(k => (k, s"s$k", rnd.nextInt(100).toDouble))
      val targetKeys = target.map(_._1).toSet
      val ops = Seq("update", "delete", "insert")
      // every op can hit every key: matched inserts must not fire
      // (Delta's WHEN NOT MATCHED doesn't), unmatched update/delete
      // must be no-ops (nothing to hit)
      val changes = rnd.shuffle((1L to 45L).toList).take(12).map { k =>
        (k, ops(rnd.nextInt(3)), s"S$k", rnd.nextInt(100).toDouble)
      }
      val got = Lake.merge(target.toDF("k", "s", "v"),
          changes.toDF("k", "op", "s", "v"), "k")
        .as[(Long, String, Double)].collect().toSet
      val cmap = changes.map(c => c._1 -> c).toMap
      val ref = target.flatMap { case (k, s, v) =>
        cmap.get(k) match {
          case Some((_, "delete", _, _)) => None
          case Some((_, "update", s2, v2)) => Some((k, s2, v2))
          case _ => Some((k, s, v)) // unmatched target or matched insert
        }
      }.toSet ++ changes.collect {
        case (k, "insert", s2, v2) if !targetKeys(k) => (k, s2, v2)
      }
      assert(got === ref, s"changes=$changes")
    }
  }

  test("MERGE applies update/delete/insert and carries the rest") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val source = Seq((1L, "update", "A", 11.0), (2L, "delete", "x", 0.0),
      (9L, "insert", "Z", 90.0), (7L, "delete", "y", 0.0))
      .toDF("k", "op", "s", "v")
    val got = Lake.merge(target, source, "k").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "A", 11.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (9L, "Z", 90.0)))
  }

  // ---- DDSketch quantile histogram ---------------------------------

  test("DDSketch quantile estimate is within gamma relative error of exact") {
    import spark.implicits._
    // lognormal-ish positive data: exp(z) over a deterministic z grid
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(20000)(math.exp(rnd.nextGaussian() * 1.5 + 3.0))
    val df = xs.map(("g", _)).toDF("grp", "x")
    val hist = pipeline.Sketches.ddHistogram(df, "grp", "x")
    val qs = Seq(0.01, 0.1, 0.5, 0.9, 0.99)
    val got = pipeline.Sketches.ddQuantiles(hist, qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val sorted = xs.sorted
    val gamma = math.exp(19803 / 1e6) // ≈ 1.02
    qs.foreach { q =>
      val exact = sorted(math.floor(q * (xs.size - 1)).toInt)
      val est = got(q)
      // lower-edge estimate: γ^b ≤ x < γ^(b+1) ⇒ est ∈ (exact/γ, exact]
      assert(est <= exact * 1.0001 && est >= exact / gamma * 0.9999,
        s"q=$q exact=$exact est=$est")
    }
  }

  test("DDSketch merge(halves) == whole; sign/zero/null/NaN handling") {
    import spark.implicits._
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      -1500.0, -2.5, -0.004, 0.0, 0.0, 0.003, 0.8, 1.0, 42.0, 42.0,
      9.9e7, null, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity) ++ (1 to 200).map(i =>
      java.lang.Double.valueOf(i * 0.37))
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("i", "grp", "x")
    val whole = pipeline.Sketches.ddHistogram(df.select("grp", "x"), "grp", "x")
    val merged = pipeline.Sketches.ddMerge(
      pipeline.Sketches.ddHistogram(
        df.filter($"i" % 2 === 0).select("grp", "x"), "grp", "x"),
      pipeline.Sketches.ddHistogram(
        df.filter($"i" % 2 === 1).select("grp", "x"), "grp", "x"))
    val w = whole.orderBy("sign", "bucket")
      .as[(String, Int, Long, Long)].collect().toSeq
    val m = merged.orderBy("sign", "bucket")
      .as[(String, Int, Long, Long)].collect().toSeq
    assert(w === m, "merge must equal whole")
    // null/NaN/±Inf dropped; two zeros in the zero counter
    assert(w.map(_._4).sum === vals.count(v =>
      v != null && !v.isNaN && !v.isInfinite))
    assert(w.find(_._2 == 0).map(_._4) === Some(2L))
    // negatives live in the sign=-1 store, ordered most-negative first
    val q0 = pipeline.Sketches.ddQuantiles(whole, Seq(0.0))
      .select("sign", "est").as[(Int, Double)].collect()(0)
    assert(q0._1 === -1 && q0._2 < -1000,
      s"q=0 must land on the most negative value, got $q0")
  }

  test("DDSketch histogram is order-free: identical under repartitioning") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g" + (i % 3), i * 1.7)).toDF("grp", "x")
    def sketch(d: org.apache.spark.sql.DataFrame) =
      pipeline.Sketches.ddHistogram(d, "grp", "x")
        .orderBy("grp", "sign", "bucket")
        .as[(String, Int, Long, Long)].collect().toSeq
    assert(sketch(df) === sketch(df.repartition(37)))
  }

  // ---- Bloom sketch table --------------------------------------------

  test("Bloom table: no false negatives; merge == whole incl. overlap; order-free") {
    import spark.implicits._
    val vals = (1 to 3000).map(i => ("g" + (i % 2), s"v$i"))
    val df = vals.toDF("grp", "v")
    val whole = pipeline.Sketches.bloomBits(df, "grp", "v", 4096, 3)
    // overlapping halves — OR idempotence means re-added rows are free
    val merged = pipeline.Sketches.bloomMerge(
      pipeline.Sketches.bloomBits(df.limit(2000), "grp", "v", 4096, 3),
      pipeline.Sketches.bloomBits(
        df.exceptAll(df.limit(1000)), "grp", "v", 4096, 3))
    def tbl(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("grp", "word").as[(String, Long, Long)].collect().toSeq
    assert(tbl(whole) === tbl(merged), "merge == whole under overlap")
    assert(tbl(whole) === tbl(pipeline.Sketches.bloomBits(
      df.repartition(23), "grp", "v", 4096, 3)), "order-free")
    // every inserted value must be found (zero false negatives)
    val probes = Seq("v1", "v2", "v1500", "v3000", "absent-x", "absent-y")
    val got = pipeline.Sketches.bloomContains(whole, probes, 4096, 3)
      .select("grp", "probe", "present")
      .as[(String, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    Seq(("g1", "v1"), ("g0", "v2"), ("g0", "v1500"), ("g0", "v3000"))
      .foreach { case (g, v) =>
        assert(got((g, v)), s"inserted $v must probe present in $g") }
  }

  // ---- Unicode script profile / boilerplate removal -----------------

  test("scriptProfile counts scripts and picks the dominant one") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "hello world"),                    // latin
      (2L, "Привет мир"),                     // cyrillic
      (3L, "汉字 text mixed 汉字汉字汉字"),     // han > latin (9 > 9? see below)
      (4L, "123 !!!"),                        // no letters
      (5L, "abcde АБВГД")                     // 5 = 5 tie → latin (first)
    ).toDF("id", "t")
    val p = df.select(col("id"),
        pipeline.TextStats.scriptProfile(col("t")).as("p"))
      .select(col("id"), col("p.n_latin"), col("p.n_cyrillic"),
        col("p.n_han"), col("p.n_letters"), col("p.dominant"))
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p(1L) === (1L, 10L, 0L, 0L, 10L, "latin"))
    assert(p(2L) === (2L, 0L, 9L, 0L, 9L, "cyrillic"))
    // "汉字 text mixed 汉字汉字汉字": 8 han, 9 latin → latin dominant
    assert(p(3L)._4 === 8L)
    assert(p(3L)._6 === (if (p(3L)._2 >= 8L) "latin" else "han"))
    assert(p(4L) === (4L, 0L, 0L, 0L, 0L, "none"))
    assert(p(5L)._6 === "latin", "ties break on Scripts declaration order")
  }

  test("boilerplate blocks classify by integer rules; main content reassembles in order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val good1 = "the quick brown fox of the meadow is happy to run " +
      "and jump in the field that it loves"      // long + stopword-rich
    val good2 = "a second paragraph of real content that is also long " +
      "enough to pass the length and stopword bars"
    val page =
      s"""<html><body><div><a href="/">Home</a> <a href="/x">News now</a></div>
         |<h1>Tiny</h1><p>$good1</p><p>short one</p><p>$good2</p>
         |<div>Copyright <a>terms</a> <a>privacy policy pages</a></div>
         |</body></html>""".stripMargin.replace("\n", " ")
    val df = Seq((7L, page)).toDF("id", "html")
    val blocks = pipeline.TextStats.boilerplateBlocks(df, "id", "html")
    val byPos = blocks.orderBy("pos")
      .select("pos", "n_chars", "anchor_chars", "cls", "txt")
      .as[(Int, Long, Long, String, String)].collect()
    val nav = byPos.find(_._5.startsWith("Home")).get
    // anchor text is everything but the inter-anchor space
    assert(nav._4 === "boilerplate" && nav._3 === nav._2 - 1,
      s"nav is (all but one space) anchor text: $nav")
    assert(byPos.find(_._5 === "Tiny").get._4 === "short")
    assert(byPos.find(_._5 === good1).get._4 === "good")
    assert(byPos.find(_._5 === "short one").get._4 === "short")
    assert(byPos.find(_._5 === good2).get._4 === "good")
    assert(byPos.find(_._5.startsWith("Copyright")).get._4 === "boilerplate")
    val mc = pipeline.TextStats.mainContent(blocks)
      .select("n_good", "main_text").as[(Long, String)].collect()(0)
    assert(mc._1 === 2L)
    assert(mc._2 === s"$good1\n$good2", "good blocks join in block order")
  }

  test("sentence segmentation: boundaries, multi-punct, trailing text, empties") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "One. Two!  Three? tail without end"),
      (2L, "Shout!! Really?! yes."),
      (3L, "no boundary here"),
      (4L, "")).toDF("id", "t")
    val got = df.select(col("id"),
        pipeline.TextStats.sentences(col("t")).as("ss"))
      .as[(Long, Seq[String])].collect().map(r => r._1 -> r._2).toMap
    assert(got(1L) === Seq("One.", "Two!", "Three?", "tail without end"))
    // ([.!?])\s+ fires on the LAST punct char of a run
    assert(got(2L) === Seq("Shout!!", "Really?!", "yes."))
    assert(got(3L) === Seq("no boundary here"))
    assert(got(4L) === Seq())
  }

  test("mainContent of a document with no good blocks is the empty string") {
    import spark.implicits._
    val df = Seq((1L, "<p>tiny</p>")).toDF("id", "html")
    val mc = pipeline.TextStats.mainContent(
        pipeline.TextStats.boilerplateBlocks(df, "id", "html"))
      .select("n_good", "main_text").as[(Long, String)].collect()(0)
    assert(mc === ((0L, "")))
  }
}
