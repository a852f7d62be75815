package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step that belongs in front of every content key
  * (exact-dup md5, MinHash shingles, substring windows): the same visible
  * text arrives from the web in composed and decomposed forms ("é" vs
  * "e"+U+0301), and un-normalized keys silently split duplicate groups
  * (reference behavior: xclim has no text surface; this follows Unicode
  * TR15, the public spec both JDK `java.text.Normalizer` and DuckDB's
  * `nfc_normalize` implement).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check scan
  * (ASCII and already-composed text — the overwhelming majority of a real
  * corpus — allocates nothing and returns the input UTF8String as-is);
  * only strings that actually carry decomposed sequences pay the
  * String round-trip. Per-row, shuffle-free, whole-stage-codegen
  * friendly via the static call.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs STRING, got $other")
  }
  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
