package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing (Schleimer/Wilkerson/Aiken SIGMOD'03) fingerprint GENERATOR:
  * emits the DISTINCT (pos, fp) selected by a w-window minimum over the
  * polynomial k-gram hashes of the (pre-normalised, ASCII) text — the
  * whole MOSS selection as one document-local JVM pass.
  *
  * Bit-identical to the windowed-plan form it replaces
  * ([[graft.pipeline.TextStats.winnowFingerprintsWindowed]], pinned by
  * spec): hashes fold exactly like [[RollingHashExplodeExpr]]
  * (h = fold((acc·B + byte) mod M)), the selection key is
  * h·P + (P−1−pos) with 1-based gram positions (so ties inside a window
  * are impossible and the latest-position-wins convention is encoded in
  * the key itself), full windows only, one row per distinct selected key.
  *
  * Scale shape — this is the point: the windowed form shuffled and
  * sorted EVERY k-gram of the corpus by (doc, pos) before selecting
  * ~2/(w+1) of them; here selection happens inside the scan stage with a
  * monotonic-deque sliding minimum (O(grams) amortised), so winnowing a
  * 100 TB corpus is embarrassingly parallel and its only shuffle is
  * whatever the CONSUMER does with the fingerprints. Documents longer
  * than P normalised chars overflow the key's position field and raise,
  * matching the windowed form's guard. */
case class WinnowExplodeExpr(child: Expression, k: Int, w: Int,
                             b: Long, m: Long, p: Long)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 2, s"k-gram size must be >= 2, got $k")
  require(w >= 2, s"winnow window must be >= 2, got $w")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"winnow_explode needs STRING, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val u = child.eval(input).asInstanceOf[UTF8String]
    if (u == null) return Nil
    val bytes = u.getBytes
    val ngrams = bytes.length - k + 1
    if (ngrams < w) return Nil
    val keys = new Array[Long](ngrams)
    var j = 0
    while (j < ngrams) {
      var h = 0L
      var i = j
      val end = j + k
      while (i < end) { h = (h * b + (bytes(i) & 0xffL)) % m; i += 1 }
      val pos = j + 1L // 1-based gram starts, like the windowed form
      if (pos >= p) throw new IllegalArgumentException(
        s"document exceeds $p normalised chars for winnowing: pos $pos")
      keys(j) = h * p + (p - 1 - pos)
      j += 1
    }
    // sliding-window minimum via monotonic deque of indices; keys are
    // unique (distinct position field), so no tie-break branch exists.
    // Distinct selected keys via a primitive open-addressing set — the
    // boxed LinkedHashSet this replaced dominated the pass at 29M
    // fingerprints (~20 s → ~7 s over 500k docs, ScaleRehearsalR11).
    val nWins = ngrams - w + 1
    val cap = Integer.highestOneBit(math.max(16, nWins * 2) - 1) << 1
    val mask = cap - 1
    val tbl = new Array[Long](cap)
    java.util.Arrays.fill(tbl, -1L) // selKeys are always >= 0
    val sel = new Array[Long](nWins)
    var nSel = 0
    val deque = new Array[Int](ngrams)
    var head = 0
    var tail = 0
    j = 0
    while (j < ngrams) {
      while (tail > head && keys(deque(tail - 1)) > keys(j)) tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) {
        val v = keys(deque(head))
        var idx = (java.lang.Long.hashCode(v) * 0x9E3779B9) & mask
        while (tbl(idx) != -1L && tbl(idx) != v) idx = (idx + 1) & mask
        if (tbl(idx) == -1L) { tbl(idx) = v; sel(nSel) = v; nSel += 1 }
      }
      j += 1
    }
    val n = nSel
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < n
      override def next(): InternalRow = {
        val selKey = sel(i)
        i += 1
        InternalRow((p - 1 - (selKey % p)).toInt, selKey / p)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExplodeExpr =
    copy(child = newChild)
}

object WinnowExplode {
  def winnowExplode(text: Column, k: Int, w: Int, b: Long = 257L,
                    m: Long = 2147483647L, p: Long = 1L << 20): Column =
    ColumnBridge.column(
      WinnowExplodeExpr(ColumnBridge.expression(text), k, w, b, m, p))
}
