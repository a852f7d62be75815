package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Mann–Kendall S statistic S = Σ_{i<j} sign(x_j − x_i) of one series
  * given as ARRAY<DOUBLE> in time order, in O(n log n) — the rank-based
  * replacement for the per-entity O(n²) pair-cloud self-join (reference:
  * xclim pairs Sen's slope with the MK test; the pairwise S definition is
  * the public Kendall/Mann form). Decomposition: with D = #strict
  * inversions (x_i > x_j, i<j) counted by a stable merge sort, E = #equal
  * pairs (from tie runs of the sorted array), S = (total − E − D) − D.
  * Every quantity is an exact integer, so the result is bit-identical to
  * the pair cloud under any partitioning — PropertySpec pins the two forms
  * equal on tied series. At century-long daily series (n ≈ 36k) this is
  * ~600k comparisons per entity instead of 1.3 G joined rows.
  * Precondition: no NaN (the daily-total inputs are aggregated parquet
  * doubles; NaN would poison any pairwise formulation equally).
  */
case class MannKendallS(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mk_s needs ARRAY<DOUBLE>, got $other")
  }
  override def nullSafeEval(a: Any): Any =
    MannKendallS.mkS(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MannKendallS.mkS($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object MannKendallS {
  def mkS(a: ArrayData): Long = {
    val n = a.numElements()
    if (n < 2) return 0L
    val arr = new Array[Double](n)
    var x = 0
    while (x < n) { arr(x) = a.getDouble(x); x += 1 }
    val tmp = new Array[Double](n)
    var inv = 0L
    // iterative bottom-up merge sort, counting strict inversions; the
    // `<=` branch keeps equal pairs out of the inversion count
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n - width) {
        val mid = lo + width
        val hi = math.min(lo + 2 * width, n)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (arr(i) <= arr(j)) { tmp(k) = arr(i); i += 1 }
          else { inv += (mid - i); tmp(k) = arr(j); j += 1 }
          k += 1
        }
        while (i < mid) { tmp(k) = arr(i); i += 1; k += 1 }
        while (j < hi) { tmp(k) = arr(j); j += 1; k += 1 }
        System.arraycopy(tmp, lo, arr, lo, hi - lo)
        lo += 2 * width
      }
      width *= 2
    }
    var equal = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && arr(j) == arr(i)) j += 1
      val t = (j - i).toLong
      equal += t * (t - 1) / 2
      i = j
    }
    val total = n.toLong * (n - 1) / 2
    total - equal - 2L * inv
  }

  /** S over a series handed as ARRAY<DOUBLE> already in time order. */
  def mannKendallS(valuesByTime: Column): Column =
    ColumnBridge.column(MannKendallS(ColumnBridge.expression(valuesByTime)))
}
