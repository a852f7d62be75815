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

  /** Z-value intervals (inclusive) covering the grid box
    * `[xlo, xhi] × [ylo, yhi]` — the Tropf–Herzog BIGMIN/LITMAX range
    * decomposition done as a quadtree walk: a quadtree cell's z-values
    * are one CONTIGUOUS interval, children visit in z order (y-bit
    * before x-bit, matching [[compute]]'s interleave), fully-contained
    * cells emit whole intervals, disjoint cells drop, and once the
    * interval budget is spent a partially-overlapping cell emits its
    * whole interval instead of splitting — an OVER-approximation, so
    * pruning by these ranges keeps zero false negatives. Adjacent
    * intervals coalesce; output is sorted and disjoint. This is what
    * turns a 2-D box predicate into a pure zval range scan — no
    * per-file x/y statistics needed, only the z-layout itself. */
  def zRangesForBox(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                    bits: Int = 16, maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 16, s"grid bits in [1,16]: $bits")
    val side = 1L << bits
    require(0 <= xlo && xlo <= xhi && xhi < side &&
      0 <= ylo && ylo <= yhi && yhi < side,
      s"box [$xlo,$xhi]×[$ylo,$yhi] outside the $bits-bit grid")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def emit(lo: Long, hi: Long): Unit =
      if (out.nonEmpty && out.last._2 + 1 == lo)
        out(out.size - 1) = (out.last._1, hi)
      else out += ((lo, hi))
    def go(cx: Long, cy: Long, s: Long, zbase: Long): Unit = {
      if (cx > xhi || cx + s - 1 < xlo || cy > yhi || cy + s - 1 < ylo) return
      val contained = cx >= xlo && cx + s - 1 <= xhi &&
        cy >= ylo && cy + s - 1 <= yhi
      if (contained || out.size >= maxRanges) { emit(zbase, zbase + s * s - 1); return }
      val h = s / 2
      go(cx, cy, h, zbase)                 // (x-low,  y-low)
      go(cx + h, cy, h, zbase + h * h)     // (x-high, y-low)
      go(cx, cy + h, h, zbase + 2 * h * h) // (x-low,  y-high)
      go(cx + h, cy + h, h, zbase + 3 * h * h)
    }
    go(0L, 0L, side, 0L)
    out.toSeq
  }

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

  /** [[Morton2.zRangesForBox]]'s 3-D twin: key intervals covering the
    * grid box `[xlo,xhi] × [ylo,yhi] × [zlo,zhi]` via an octree walk —
    * an octree cell's keys are one contiguous interval, children visit
    * in key order (x lowest bit, then y, then z, matching [[compute]]),
    * contained cells emit whole intervals, and past the budget a
    * partially-overlapping cell over-approximates (pruning stays
    * zero-false-negative). The (time, lat, lon) box scan a climate lake
    * runs becomes a pure key-range scan. */
  def zRangesForBox3(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                     zlo: Long, zhi: Long, bits: Int = 16,
                     maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 16, s"grid bits in [1,16]: $bits")
    val side = 1L << bits
    require(0 <= xlo && xlo <= xhi && xhi < side &&
      0 <= ylo && ylo <= yhi && yhi < side &&
      0 <= zlo && zlo <= zhi && zhi < side,
      s"box outside the $bits-bit grid")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def emit(lo: Long, hi: Long): Unit =
      if (out.nonEmpty && out.last._2 + 1 == lo)
        out(out.size - 1) = (out.last._1, hi)
      else out += ((lo, hi))
    def go(cx: Long, cy: Long, cz: Long, s: Long, base: Long): Unit = {
      if (cx > xhi || cx + s - 1 < xlo || cy > yhi || cy + s - 1 < ylo ||
        cz > zhi || cz + s - 1 < zlo) return
      val contained = cx >= xlo && cx + s - 1 <= xhi &&
        cy >= ylo && cy + s - 1 <= yhi && cz >= zlo && cz + s - 1 <= zhi
      if (contained || out.size >= maxRanges) {
        emit(base, base + s * s * s - 1); return
      }
      val h = s / 2
      val cube = h * h * h
      var k = 0
      while (k < 8) {
        go(cx + (k & 1) * h, cy + ((k >> 1) & 1) * h, cz + ((k >> 2) & 1) * h,
          h, base + k * cube)
        k += 1
      }
    }
    go(0L, 0L, 0L, side, 0L)
    out.toSeq
  }
}
