package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 16-bit coordinates — the
  * multi-dimensional clustering key behind Delta's `OPTIMIZE ZORDER BY`
  * and Iceberg's z-order sort (Morton 1966; Orenstein & Merrett,
  * PODS'84 for the range-query analysis): sorting by the interleaved
  * key keeps rows that are close in BOTH dimensions close in file
  * order, so per-file min/max statistics prune 2-D box predicates that
  * a single-column sort cannot.
  *
  * Bits beyond the low 16 of each input are ignored (callers scale
  * with [[graft.sources.Lake.scaleToGrid]]); the external replay is the
  * 32-term shift-and-or sum an engine without the intrinsic spells
  * inline — bit-identical, all values < 2^32. */
case class Morton2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"morton2 needs two LONG coordinates, got $other")
    }
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    Morton2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Morton2.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Morton2 =
    copy(left = l, right = r)
}

object Morton2 {
  /** Static kernel shared by interpreted eval and generated code: x in
    * even bit positions, y in odd. */
  def compute(x: Long, y: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((x >> i) & 1L) << (2 * i)
      out |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  /** The 32-term SQL replay (for oracle authors): x/y must already be
    * expressions valid in the target dialect. */
  def sqlReplay(x: String, y: String): String =
    ((0 until 16).map(i => s"((($x >> $i) & 1) << ${2 * i})") ++
      (0 until 16).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" + ")

  import org.apache.spark.sql.graft.ColumnBridge

  def morton2(x: Column, y: Column): Column =
    ColumnBridge.column(Morton2(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}

/** Three-way Morton interleave over 16-bit coordinates (48-bit key) —
  * the (time, lat, lon) clustering key a climate lake sorts by: any
  * box predicate over the three dims prunes to O(surface) files. Same
  * contract as [[Morton2]]; bits beyond the low 16 are ignored. */
case class Morton3(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"morton3 needs three LONG coordinates")
  }
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Morton3.compute(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.Morton3.compute($a, $b, $c)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Morton3 =
    copy(first = a, second = b, third = c)
}

object Morton3 {
  /** x in bit positions 3i, y in 3i+1, z in 3i+2. */
  def compute(x: Long, y: Long, z: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((x >> i) & 1L) << (3 * i)
      out |= ((y >> i) & 1L) << (3 * i + 1)
      out |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    out
  }

  /** The 48-term SQL replay, for oracle authors. */
  def sqlReplay(x: String, y: String, z: String): String =
    ((0 until 16).map(i => s"((($x >> $i) & 1) << ${3 * i})") ++
      (0 until 16).map(i => s"((($y >> $i) & 1) << ${3 * i + 1})") ++
      (0 until 16).map(i => s"((($z >> $i) & 1) << ${3 * i + 2})"))
      .mkString(" + ")

  import org.apache.spark.sql.graft.ColumnBridge

  def morton3(x: Column, y: Column, z: Column): Column =
    ColumnBridge.column(Morton3(ColumnBridge.expression(x),
      ColumnBridge.expression(y), ColumnBridge.expression(z)))
}
