package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two ARRAY<FLOAT> (or ARRAY<DOUBLE>) embedding
  * columns: one JIT-compiled loop per row-pair. The `zip_with`+`aggregate`
  * Column formulation runs interpreted (two array traversals with
  * per-element closure dispatch) — at near-dup verification volume
  * (pairs x dims) that is the dominant cost; this expression runs at
  * multiply-add speed and stays inside whole-stage codegen. */
case class FloatDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"float_dot needs two ARRAY<FLOAT> or two ARRAY<DOUBLE>, got $other")
    }
  }
  private def elemIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (elemIsDouble)
      FloatDotProduct.computeDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      FloatDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (elemIsDouble) "computeDouble" else "compute"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatDotProduct.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDotProduct =
    copy(left = l, right = r)
}

/** Native INTEGER-GRID dot product — the r13 engine-exact similarity
  * kernel: each per-element product lands on the 1e-12 floor grid
  * (`floor(x·y·1e12 + 0.5)`) and accumulates as int64, so the fold
  * order cannot move an ulp and any engine replaying the same
  * per-element expression (the oracle's
  * `list_sum(list_transform(..., floor(...)))`) produces the
  * bit-identical integer. Semantically identical to the interpreted
  * `aggregate(zip_with(...))` Column formulation it replaces, but a
  * ONE-NODE expression tree compiled to a single loop — the interpreted
  * form's per-pass analysis + janino cost alone added ~1.4 s to the
  * near-dup bench before any row was read. */
case class QuantizedDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quant_dot needs two ARRAY<FLOAT> or two ARRAY<DOUBLE>, got $other")
    }
  }
  private def elemIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (elemIsDouble)
      QuantizedDotProduct.computeDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      QuantizedDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (elemIsDouble) "computeDouble" else "compute"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantizedDotProduct.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDotProduct =
    copy(left = l, right = r)
}

object QuantizedDotProduct {
  /** Static kernel shared by interpreted eval and generated code. The
    * per-element chain (f32→f64 cast exact; multiply, ×1e12, +0.5, floor
    * each correctly rounded IEEE ops) is EXACTLY the expression the
    * DuckDB oracle replays; `Math.floor(...).toLong` equals Spark's own
    * FLOOR(double)→LONG on every in-range value (and both map NaN → 0). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e12 + 0.5).toLong
      i += 1
    }
    acc
  }

  /** ARRAY<DOUBLE> twin of [[compute]] — same grid, same accumulation. */
  def computeDouble(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.floor(a.getDouble(i) * b.getDouble(i) * 1e12 + 0.5).toLong
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def quantDot(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

object FloatDotProduct {
  /** Static kernel shared by interpreted eval and generated code. Sums in
    * index order with double accumulation — the same operation sequence as
    * an external engine's ordered list_sum(list_transform(...)). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** ARRAY<DOUBLE> twin of [[compute]] — same ordered accumulation. */
  def computeDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
