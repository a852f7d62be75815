package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `<a href>` extraction from HTML as a native expression — the edge
  * emitter of the web link graph (host/page-rank quality signals, crawl
  * frontier expansion, anchor-text statistics all start here). Shares
  * [[HtmlText]]'s tag walk, so links inside comments, CDATA, and
  * script/style bodies are never emitted and attribute parsing honors
  * quoted `>` exactly like text extraction does. Href values are
  * entity-decoded (`&amp;` in query strings). Order of appearance is
  * preserved; anchors without an href contribute nothing. Per-row,
  * shuffle-free; feed [[UrlNormalize]] downstream before grouping.
  */
case class HtmlLinksExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"html_links needs STRING, got $other")
  }
  override def nullSafeEval(s: Any): Any =
    HtmlLinks.links(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlLinks.links($c)")
  override protected def withNewChildInternal(c: Expression): HtmlLinksExpr =
    copy(child = c)
}

/** `(href, anchor text)` pairs — the anchor-text signal: text other
  * pages attach to a target URL is a classic retrieval/quality feature
  * aggregated per link target. Anchor text is the INNER markup of the
  * `<a>` element run through [[HtmlText]]'s extraction (nested tags
  * stripped, entities decoded, whitespace collapsed). A nested/unclosed
  * `<a>` closes the pending one at the next anchor boundary (browsers'
  * implied-close behavior); an anchor cut by EOF keeps its tail text.
  */
case class HtmlAnchorsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("href", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("text", StringType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"html_anchors needs STRING, got $other")
  }
  override def nullSafeEval(s: Any): Any =
    HtmlLinks.anchors(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlLinks.anchors($c)")
  override protected def withNewChildInternal(c: Expression): HtmlAnchorsExpr =
    copy(child = c)
}

object HtmlLinks {

  def anchors(s: UTF8String): ArrayData = {
    val in = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pendingHref: String = null
    var contentStart = 0
    def emit(contentEnd: Int): Unit = {
      if (pendingHref != null) {
        val text = HtmlText.extract(UTF8String.fromString(
          in.substring(contentStart, math.max(contentEnd, contentStart))))
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(pendingHref), text))
        pendingHref = null
      }
    }
    HtmlText.forEachTag(in) { (name, start, end) =>
      if (name == "a") {
        emit(start) // implied close of a still-open anchor
        val href = HtmlText.attrValue(in, start, end, "href")
        if (href != null && href.nonEmpty) { pendingHref = href; contentStart = end }
      } else if (name == "/a") emit(start)
    }
    emit(in.length) // EOF inside an anchor keeps the tail
    new GenericArrayData(out.toArray)
  }

  def htmlAnchors(c: Column): Column =
    ColumnBridge.column(HtmlAnchorsExpr(ColumnBridge.expression(c)))

  def links(s: UTF8String): ArrayData = {
    val in = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    HtmlText.forEachTag(in) { (name, start, end) =>
      if (name == "a") {
        val href = HtmlText.attrValue(in, start, end, "href")
        if (href != null && href.nonEmpty)
          out += UTF8String.fromString(href)
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  def htmlLinks(c: Column): Column =
    ColumnBridge.column(HtmlLinksExpr(ColumnBridge.expression(c)))
}
