package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing normalization — semantically equal to
  * `regexp_replace(lower(trim(text)), "[^a-z0-9 ]", "")` (the oracle's
  * spelling, retained as [[graft.pipeline.TextStats.winnowNormalizeSql]]
  * and property-pinned) as one pass over the UTF-8 bytes: trim ASCII
  * spaces at the ends of the RAW text (trim runs before the regex in
  * the reference expression — a leading space exposed by deletion
  * stays), lowercase A–Z, keep [a-z0-9 ], drop every other byte.
  * Multi-byte UTF-8 sequences have all bytes ≥ 0x80, so dropping bytes
  * equals dropping characters — except the two Unicode points whose
  * LOWERCASE is ASCII, which the regex form keeps and are special-cased
  * here: U+212A KELVIN SIGN → 'k' and U+0130 LATIN CAPITAL I WITH DOT
  * → 'i' (its combining dot lowers to U+0307, dropped either way).
  *
  * Why native: the regex chain measured 45 µs/doc — 22 s of the 500k-doc
  * fingerprint pass (ScaleRehearsalR11), swamping the winnow generator
  * itself. This expression is codegen'd (one static call per row). */
case class WinnowNormalizeExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"winnow_normalize needs STRING, got $other")
  }
  override def nullSafeEval(t: Any): Any =
    WinnowNormalize.normalize(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.WinnowNormalize.normalize($t)")
  override protected def withNewChildInternal(newChild: Expression): WinnowNormalizeExpr =
    copy(child = newChild)
}

/** Native `regexp_replace(lower(trim(text)), "\\s+", " ")` — the
  * whitespace-collapse normalization in front of every shingle/hash
  * consumer (content keys, fingerprints, HLL/KMV shingles, trigrams).
  * trim and Unicode lowercase go through UTF8String (the exact kernels
  * Spark's trim/lower call), then one byte pass collapses runs of Java
  * regex `\s` = [ \t\n\x0B\f\r] (ASCII-only without
  * UNICODE_CHARACTER_CLASS — multi-byte whitespace is NOT matched by
  * the regex form either) to a single space. Property-pinned equal to
  * the regex spelling, which the oracles keep. */
case class LowerCollapseWsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lower_collapse_ws needs STRING, got $other")
  }
  override def nullSafeEval(t: Any): Any =
    WinnowNormalize.lowerCollapseWs(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.WinnowNormalize.lowerCollapseWs($t)")
  override protected def withNewChildInternal(newChild: Expression): LowerCollapseWsExpr =
    copy(child = newChild)
}

object WinnowNormalize {

  private def isWs(c: Int): Boolean = // Java regex \s (ASCII-only)
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  def lowerCollapseWs(u: UTF8String): UTF8String = {
    val lowered = u.trim().toLowerCase // == lower(trim(x)), same kernels
    val b = lowered.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (isWs(c)) { // each \s+ run (even length 1) becomes ONE ' '
        if (n == 0 || out(n - 1) != ' ') { out(n) = ' '; n += 1 }
        i += 1
      } else { out(n) = c.toByte; n += 1; i += 1 }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  def lowerCollapseWs(text: Column): Column =
    ColumnBridge.column(LowerCollapseWsExpr(ColumnBridge.expression(text)))

  def normalize(u: UTF8String): UTF8String = {
    val b = u.getBytes
    var s = 0
    var e = b.length
    while (s < e && b(s) == ' ') s += 1
    while (e > s && b(e - 1) == ' ') e -= 1
    val out = new Array[Byte](e - s)
    var n = 0
    var i = s
    while (i < e) {
      val c = b(i) & 0xff
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') {
        out(n) = c.toByte; n += 1; i += 1
      } else if (c >= 'A' && c <= 'Z') {
        out(n) = (c + 32).toByte; n += 1; i += 1
      } else if (c == 0xE2 && i + 2 < e && (b(i + 1) & 0xff) == 0x84 &&
          (b(i + 2) & 0xff) == 0xAA) {
        out(n) = 'k'; n += 1; i += 3 // U+212A KELVIN SIGN lowers to 'k'
      } else if (c == 0xC4 && i + 1 < e && (b(i + 1) & 0xff) == 0xB0) {
        out(n) = 'i'; n += 1; i += 2 // U+0130 İ lowers to 'i' + U+0307
      } else i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  def winnowNormalize(text: Column): Column =
    ColumnBridge.column(WinnowNormalizeExpr(ColumnBridge.expression(text)))
}
