package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-shingle GENERATOR: emits every length-`n` codepoint
  * window of `child` as its own output row — the lateral-view form of
  * `explode(charShingles(text, n))` without materializing a per-row
  * array of ~|text| strings through an interpreted higher-order
  * transform. One pass records the byte offset of every codepoint,
  * then each shingle is a byte-range slice — O(bytes) setup and one
  * small copy per shingle, versus the HOF form's per-element lambda
  * dispatch plus array construction (the dominant cost of the sketch
  * queries at sf0.1: the explode, not the aggregation).
  *
  * Codepoint windows match Spark's `Column.substr` / DuckDB's `substr`
  * semantics, so existing shingle oracles replay unchanged. Normalize
  * the text (lower/trim/whitespace-collapse) in the projection BEFORE
  * this generator, where it runs codegen'd once per row.
  */
case class ShingleExplodeExpr(child: Expression, n: Int,
                              distinct: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"shingle length out of range: $n")

  override def elementSchema: StructType =
    StructType(Seq(StructField("sh", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"shingle_explode needs STRING, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val u = child.eval(input).asInstanceOf[UTF8String]
    if (u == null) return Nil
    val bytes = u.getBytes
    val offs = new Array[Int](bytes.length + 1) // ≥ numChars + 1 slots
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = bytes.length
    val chars = c
    if (chars < n) Nil
    else if (!distinct) new Iterator[InternalRow] {
      private var p = 0
      override def hasNext: Boolean = p <= chars - n
      override def next(): InternalRow = {
        val r = UTF8String.fromBytes(bytes, offs(p), offs(p + n) - offs(p))
        p += 1
        InternalRow(r)
      }
    } else {
      // per-row dedup inside the generator: replaces
      // explode(array_distinct(shingles)) without the array OR a
      // downstream shuffle; row order follows first occurrence
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var p = 0
      while (p <= chars - n) {
        seen.add(UTF8String.fromBytes(bytes, offs(p), offs(p + n) - offs(p)))
        p += 1
      }
      val it = seen.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = InternalRow(it.next())
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleExplodeExpr =
    copy(child = newChild)
}

object ShingleExplode {
  def shingleExplode(text: Column, n: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(
      ShingleExplodeExpr(ColumnBridge.expression(text), n, distinct))
}
