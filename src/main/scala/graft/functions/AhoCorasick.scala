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

  // Trie over exact chars (UTF-16 code units — patterns and text
  // compare as Java strings, same contract as String.indexOf).
  private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val patEnd = mutable.ArrayBuffer(-1) // pattern id ending at node
  private var failArr: Array[Int] = _
  private var dictArr: Array[Int] = _ // nearest fail-chain node with output

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

  { // BFS fail links (Aho–Corasick construction)
    val n = children.length
    failArr = new Array[Int](n)
    dictArr = Array.fill(n)(-1)
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { c => failArr(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      dictArr(v) =
        if (patEnd(failArr(v)) >= 0) failArr(v) else dictArr(failArr(v))
      children(v).foreach { case (ch, c) =>
        var f = failArr(v)
        while (f != 0 && !children(f).contains(ch)) f = failArr(f)
        // depth(fail(v)) < depth(v), so this target is never c itself
        failArr(c) = children(f).getOrElse(ch, 0)
        queue += c
      }
    }
  }

  private val nPat = patterns.length
  private val bitmapWords = (nPat + 63) >>> 6

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
      while (v != 0 && !children(v).contains(ch)) v = failArr(v)
      v = children(v).getOrElse(ch, 0)
      var u = if (patEnd(v) >= 0) v else dictArr(v)
      while (u >= 0) {
        val id = patEnd(u)
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
