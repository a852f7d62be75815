package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial k-gram hash GENERATOR: emits (p0, h) for every k-gram of
  * the (pre-normalised, ASCII) text — the lateral-view form of
  * `posexplode(TextStats.kgramHashes(text, k))` as one tight JVM loop
  * instead of nested interpreted HOF lambdas (k `element_at` dispatches
  * per position). Bit-identical fold: h = fold_{i<k}((acc·B + code) mod
  * M) with B = 257, M = 2^31−1, codes = unsigned byte values — equal to
  * `ascii()` per char for the winnowing alphabet [a-z0-9 ], which
  * [[graft.pipeline.TextStats.winnowNormalize]] guarantees upstream.
  * Positions are 0-based like posexplode's. */
case class RollingHashExplodeExpr(child: Expression, k: Int, b: Long, m: Long)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 2, s"k-gram size must be >= 2, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("p0", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"rolling_hash_explode needs STRING, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val u = child.eval(input).asInstanceOf[UTF8String]
    if (u == null) return Nil
    val bytes = u.getBytes
    val len = bytes.length
    if (len < k) Nil
    else new Iterator[InternalRow] {
      private var p = 0
      override def hasNext: Boolean = p <= len - k
      override def next(): InternalRow = {
        var h = 0L
        var i = p
        val end = p + k
        while (i < end) { h = (h * b + (bytes(i) & 0xffL)) % m; i += 1 }
        val r = InternalRow(p, h)
        p += 1
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashExplodeExpr =
    copy(child = newChild)
}

object RollingHashExplode {
  def rollingHashExplode(text: Column, k: Int, b: Long = 257L,
                         m: Long = 2147483647L): Column =
    ColumnBridge.column(
      RollingHashExplodeExpr(ColumnBridge.expression(text), k, b, m))
}
