package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset/content sniff for crawled payloads — the dispatch step between
  * a WARC payload (bytes of unknown provenance; HTTP headers lie) and
  * text processing ([[HtmlText]], tokenization): classify the byte
  * stream so the pipeline can decode, transcode, or route to the binary
  * lane. Deterministic byte rules, no ICU statistics:
  *
  *   - `utf-8-bom` / `utf-16` — BOM present (EF BB BF; FE FF / FF FE);
  *   - `binary` — a NUL byte, or control bytes (< 0x20 other than
  *     HT/LF/CR/FF/ESC) exceeding 10% of the first [[SniffWindow]] bytes;
  *   - `ascii` — every sniffed byte < 0x80;
  *   - `utf-8` — high bytes present and every multibyte sequence in the
  *     window is well-formed UTF-8 (overlongs and bare continuations
  *     rejected);
  *   - `latin-1` — high bytes present, not valid UTF-8.
  *
  * Only the first [[SniffWindow]] bytes are examined (crawl payloads are
  * MBs; charset is decidable from the head — same windowing trick as
  * content sniffers in browsers). Per-row, shuffle-free, codegen'd.
  */
case class CharsetSniffExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"charset_sniff needs BINARY, got $other")
  }
  override def nullSafeEval(b: Any): Any =
    UTF8String.fromString(CharsetSniff.sniff(b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.CharsetSniff.sniff($c))")
  override protected def withNewChildInternal(c: Expression): CharsetSniffExpr =
    copy(child = c)
}

object CharsetSniff {

  val SniffWindow: Int = 8192

  def sniff(b: Array[Byte]): String = {
    val n = math.min(b.length, SniffWindow)
    if (n == 0) return "ascii"
    // BOMs
    if (n >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
        b(2) == 0xBF.toByte) return "utf-8-bom"
    if (n >= 2 && ((b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) ||
        (b(0) == 0xFF.toByte && b(1) == 0xFE.toByte))) return "utf-16"
    var i = 0
    var controls = 0
    var high = false
    var validUtf8 = true
    while (i < n) {
      val v = b(i) & 0xff
      if (v == 0) return "binary"
      if (v < 0x20 && v != '\t' && v != '\n' && v != '\r' && v != 0x0c &&
          v != 0x1b) controls += 1
      if (v < 0x80) i += 1
      else {
        high = true
        if (validUtf8) {
          val len =
            if (v >= 0xc2 && v <= 0xdf) 2
            else if (v >= 0xe0 && v <= 0xef) 3
            else if (v >= 0xf0 && v <= 0xf4) 4
            else 0 // 0x80..0xc1 lead or 0xf5+: invalid
          if (len == 0) { validUtf8 = false; i += 1 }
          else if (i + len > n) {
            // sequence truncated by the window edge (not by the payload):
            // treat as valid continuation unless the payload itself ends
            if (i + len > b.length) validUtf8 = false
            i = n
          } else {
            var k = 1
            var ok = true
            while (k < len && ok) {
              val c = b(i + k) & 0xff
              ok = c >= 0x80 && c <= 0xbf
              k += 1
            }
            // overlong/surrogate edges per RFC 3629
            if (ok && v == 0xe0) ok = (b(i + 1) & 0xff) >= 0xa0
            if (ok && v == 0xed) ok = (b(i + 1) & 0xff) <= 0x9f
            if (ok && v == 0xf0) ok = (b(i + 1) & 0xff) >= 0x90
            if (ok && v == 0xf4) ok = (b(i + 1) & 0xff) <= 0x8f
            if (!ok) { validUtf8 = false; i += 1 } else i += len
          }
        } else i += 1
      }
    }
    if (controls * 10 > n) "binary"
    else if (!high) "ascii"
    else if (validUtf8) "utf-8"
    else "latin-1"
  }

  def charsetSniff(c: Column): Column =
    ColumnBridge.column(CharsetSniffExpr(ColumnBridge.expression(c)))
}
