package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring scan (Aho–Corasick 1975, CACM 18(6)) as a
  * native codegen'd expression: ONE left-to-right pass over the text
  * reports, for a fixed pattern list, the total number of pattern
  * occurrences (overlapping occurrences all count — "aaa" contains
  * "aa" twice) and how many DISTINCT patterns occur at least once.
  *
  * This is the blocklist primitive of web-corpus cleaning (C4's
  * "bad words" page filter, Common Crawl URL/host denylists): at
  * 100 TB the naive form is P regexp/contains scans per document —
  * P full passes over the corpus — while the automaton is one pass
  * total, O(|text| + matches) per row regardless of list size. The
  * pattern list is driver-side configuration baked into the
  * expression (the same broadcast-small-side shape as
  * [[RobotsMatch]]'s rule map): a per-executor automaton, zero
  * shuffle, zero join.
  *
  * Semantics are deliberately exact-integer (occurrence counts), so
  * an external engine can replicate the result with a position scan
  * and verdicts stay engine-exact; mirrors the reference's
  * `data_flags`-style boolean evidence posture
  * (reference: src/xclim/core/dataflags.py — flag = evidence + verdict).
  *
  * Output struct: `total_hits BIGINT, distinct_hits INT`.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.distinct.length == patterns.length, "duplicate patterns")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  // Frozen automaton state — flat arrays only, built once below. The
  // hot loop never touches a Map or boxes a char: ASCII transitions
  // (the blocklist norm) read a dense fail-RESOLVED goto table (the
  // DFA form — no fail-chasing at scan time), non-ASCII edges live in
  // per-node sorted parallel char/next arrays walked with binary
  // search plus fail links. Memory: 512 B/node for the ASCII table —
  // fine for real blocklists (C4 badwords ≈ 5k nodes ≈ 2.5 MB); a
  // multi-million-node dictionary would want the sorted-array form
  // for ASCII too.
  // (patEnd, fail, dict, asciiNext, hiChars, hiNexts)
  private val (patEndArr, failArr, dictArr, asciiNext, hiChars, hiNexts) = {
    // Build-time trie over exact chars (UTF-16 code units — patterns
    // and text compare as Java strings, same contract as String.indexOf).
    val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val patEnd = mutable.ArrayBuffer(-1)
    patterns.zipWithIndex.foreach { case (p, id) =>
      var v = 0
      p.foreach { ch =>
        v = children(v).getOrElseUpdate(ch, {
          children += mutable.Map.empty[Char, Int]
          patEnd += -1
          children.length - 1
        })
      }
      patEnd(v) = id
    }
    val n = children.length
    // the frozen ASCII goto table is n << 7 ints (512 B/node); past 2^24
    // nodes the shift overflows Int — fail with guidance, not a
    // NegativeArraySizeException deep in Array.<init>
    require(n < (1 << 24),
      s"AhoCorasick: $n trie nodes exceeds the flat-array form's 2^24-node " +
        "bound (the resolved ASCII goto table is 512 B/node); for " +
        "dictionaries this large use a sorted-array transition form instead")
    val fail = new Array[Int](n)
    val dict = Array.fill(n)(-1)
    val bfs = new Array[Int](n) // BFS order: fail(v) always precedes v
    var bfsLen = 1
    var qh = 1 // bfs(0) = 0 (root)
    children(0).valuesIterator.foreach { c =>
      fail(c) = 0; bfs(bfsLen) = c; bfsLen += 1
    }
    while (qh < bfsLen) {
      val v = bfs(qh); qh += 1
      if (v != 0) {
        dict(v) = if (patEnd(fail(v)) >= 0) fail(v) else dict(fail(v))
        children(v).foreach { case (ch, c) =>
          var f = fail(v)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          // depth(fail(v)) < depth(v), so this target is never c itself
          fail(c) = children(f).getOrElse(ch, 0)
          bfs(bfsLen) = c; bfsLen += 1
        }
      }
    }
    // Freeze: resolved ASCII goto in BFS order (fail(v)'s row exists
    // when v's is filled), sorted arrays for the non-ASCII residue.
    val ascii = new Array[Int](n << 7)
    val hc = new Array[Array[Char]](n)
    val hn = new Array[Array[Int]](n)
    var bi = 0
    while (bi < bfsLen) {
      val v = bfs(bi)
      val base = v << 7
      var ch = 0
      while (ch < 128) {
        ascii(base + ch) = children(v).get(ch.toChar) match {
          case Some(c) => c
          case None    => if (v == 0) 0 else ascii((fail(v) << 7) + ch)
        }
        ch += 1
      }
      val hi = children(v).iterator.filter(_._1 >= 128).toArray.sortBy(_._1)
      hc(v) = hi.map(_._1)
      hn(v) = hi.map(_._2)
      bi += 1
    }
    (patEnd.toArray, fail, dict, ascii, hc, hn)
  }

  private val nPat = patterns.length
  private val bitmapWords = (nPat + 63) >>> 6

  /** Raw-trie edge lookup for non-ASCII `ch` at `v`: −1 if absent. */
  private def hiEdge(v: Int, ch: Char): Int = {
    val ks = hiChars(v)
    var lo = 0
    var hi = ks.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val k = ks(mid)
      if (k == ch) return hiNexts(v)(mid)
      else if (k < ch) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** One pass; returns (totalHits, distinctHits). Allocation per call
    * is one small long[] bitmap — safe under concurrent tasks sharing
    * this automaton (no shared mutable scratch). */
  def scan(text: String): (Long, Int) = {
    val seen = new Array[Long](bitmapWords)
    var total = 0L
    var v = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      if (ch < 128) {
        v = asciiNext((v << 7) | ch)
      } else {
        var nv = hiEdge(v, ch)
        while (nv < 0 && v != 0) { v = failArr(v); nv = hiEdge(v, ch) }
        v = if (nv >= 0) nv else 0
      }
      var u = if (patEndArr(v) >= 0) v else dictArr(v)
      while (u >= 0) {
        val id = patEndArr(u)
        total += 1
        seen(id >>> 6) |= 1L << (id & 63)
        u = dictArr(u)
      }
      i += 1
    }
    var distinct = 0
    var w = 0
    while (w < bitmapWords) { distinct += java.lang.Long.bitCount(seen(w)); w += 1 }
    (total, distinct)
  }

  def scanRow(text: UTF8String): InternalRow = {
    val (t, d) = scan(text.toString)
    InternalRow(t, d)
  }
}

/** `ac_scan(text)` over a fixed pattern list — see [[AhoCorasick]]. */
case class AhoCorasickExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("total_hits", LongType, nullable = false),
    StructField("distinct_hits", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"ac_scan needs STRING, got $other")
  }
  @transient private lazy val ac = new AhoCorasick(patterns.toArray)
  override def nullSafeEval(t: Any): Any = ac.scanRow(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, t => s"$acRef.scanRow($t)")
  }
  override protected def withNewChildInternal(newChild: Expression): AhoCorasickExpr =
    copy(child = newChild)
}

object AhoCorasick {
  def acScan(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AhoCorasickExpr(ColumnBridge.expression(text), patterns))
}
