package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction as a native codegen'd expression — the first
  * transform every web-scale training pipeline applies to crawled pages
  * (WARC payloads are markup; dedup/quality/tokenization all want text).
  * The reference has no web surface; this rounds out the ingest tier with
  * [[graft.sources.Warc]].
  *
  * Contract (single pass, deterministic, no DOM):
  *   1. comments `<!-- -->`, CDATA sections, and DOCTYPE are dropped;
  *   2. `<script>`/`<style>` elements are dropped INCLUDING content
  *      (case-insensitive, attributes allowed, content may contain `<`);
  *   3. every other tag is replaced by one space — attribute values may
  *      contain quoted `>` without ending the tag;
  *   4. character entities decode after tag stripping (entity-encoded
  *      markup stays text, the HTML semantics): named core set
  *      (amp lt gt quot apos nbsp) + numeric `&#NNN;`/`&#xHH;`;
  *      malformed entities pass through verbatim;
  *   5. whitespace runs collapse to one space; result is trimmed.
  *
  * A truncated page (EOF inside a tag/script/comment) drops the open
  * construct's tail rather than throwing — crawl data is routinely cut
  * mid-tag and a per-row exception would poison whole partitions.
  *
  * Per-row, shuffle-free, whole-stage-codegen via the static call; one
  * output builder allocation per row that actually contains markup.
  */
case class HtmlTextExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"html_text needs STRING, got $other")
  }
  override def nullSafeEval(s: Any): Any =
    HtmlText.extract(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.extract($c)")
  override protected def withNewChildInternal(c: Expression): HtmlTextExtract =
    copy(child = c)
}

object HtmlText {

  def extract(s: UTF8String): UTF8String = {
    val in = s.toString
    if (in.indexOf('<') < 0 && in.indexOf('&') < 0) {
      val collapsed = collapse(in)
      if (collapsed == in) s else UTF8String.fromString(collapsed)
    } else UTF8String.fromString(collapse(decodeEntities(stripMarkup(in))))
  }

  def htmlText(c: Column): Column =
    ColumnBridge.column(HtmlTextExtract(ColumnBridge.expression(c)))

  /** Tags/comments/CDATA → space; script/style elements dropped whole. */
  private def stripMarkup(in: String): String = {
    val n = in.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = in.charAt(i)
      if (c != '<') { out.append(c); i += 1 }
      else if (startsWith(in, i + 1, "!--")) {
        val end = in.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
        out.append(' ')
      } else if (startsWith(in, i + 1, "![CDATA[")) {
        val end = in.indexOf("]]>", i + 9)
        i = if (end < 0) n else end + 3
        out.append(' ')
      } else if (i + 1 < n &&
          (isAsciiLetter(in.charAt(i + 1)) || in.charAt(i + 1) == '/' ||
            in.charAt(i + 1) == '!' || in.charAt(i + 1) == '?')) {
        val nameStart = if (in.charAt(i + 1) == '/') i + 2 else i + 1
        val tagEnd = skipTag(in, i + 1)
        val name = tagName(in, nameStart)
        val selfClosing = tagEnd >= 2 && tagEnd <= n &&
          in.charAt(tagEnd - 1) == '>' && in.charAt(tagEnd - 2) == '/'
        i = tagEnd
        out.append(' ')
        if (in.charAt(nameStart - 1) != '/' && !selfClosing &&
            (name == "script" || name == "style")) {
          val close = indexOfClose(in, i, name)
          i = if (close < 0) n else skipTag(in, close + 1)
        }
      } else { out.append(c); i += 1 } // lone '<' is text
    }
    out.toString
  }

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def startsWith(s: String, at: Int, p: String): Boolean =
    at + p.length <= s.length && s.regionMatches(false, at, p, 0, p.length)

  private def tagName(s: String, at: Int): String = {
    var j = at
    while (j < s.length && isAsciiLetter(s.charAt(j))) j += 1
    s.substring(at, j).toLowerCase
  }

  /** Position just past the tag's closing '>' (quoted attribute values may
    * contain '>'); EOF-truncated tags consume to end of input. */
  private def skipTag(s: String, at: Int): Int = {
    var j = at
    var quote: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j + 1
      j += 1
    }
    j
  }

  /** Index of `</name` (case-insensitive) at or after `from`, -1 if none. */
  private def indexOfClose(s: String, from: Int, name: String): Int = {
    val target = "</" + name
    var j = from
    val last = s.length - target.length
    while (j <= last) {
      if (s.regionMatches(true, j, target, 0, target.length)) return j
      j += 1
    }
    -1
  }

  /** Walk the markup, calling `f(name, tagStart, tagEnd)` for every real
    * tag (open or close; name lowercased, '/' prefix kept for closes);
    * comments/CDATA are skipped and script/style CONTENT is not entered —
    * the same traversal [[stripMarkup]] performs, shared so link
    * extraction and text extraction can never disagree on structure. */
  private[functions] def forEachTag(in: String)(
      f: (String, Int, Int) => Unit): Unit = {
    val n = in.length
    var i = 0
    while (i < n) {
      val c = in.charAt(i)
      if (c != '<') i += 1
      else if (startsWith(in, i + 1, "!--")) {
        val end = in.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (startsWith(in, i + 1, "![CDATA[")) {
        val end = in.indexOf("]]>", i + 9)
        i = if (end < 0) n else end + 3
      } else if (i + 1 < n &&
          (isAsciiLetter(in.charAt(i + 1)) || in.charAt(i + 1) == '/' ||
            in.charAt(i + 1) == '!' || in.charAt(i + 1) == '?')) {
        val isClose = in.charAt(i + 1) == '/'
        val nameStart = if (isClose) i + 2 else i + 1
        val tagEnd = skipTag(in, i + 1)
        val name = tagName(in, nameStart)
        val selfClosing = tagEnd >= 2 && tagEnd <= n &&
          in.charAt(tagEnd - 1) == '>' && in.charAt(tagEnd - 2) == '/'
        f(if (isClose) "/" + name else name, i, tagEnd)
        i = tagEnd
        if (!isClose && !selfClosing && (name == "script" || name == "style")) {
          val close = indexOfClose(in, i, name)
          i = if (close < 0) n else skipTag(in, close + 1)
        }
      } else i += 1
    }
  }

  /** Attribute value of `attr` (case-insensitive) inside the tag spanning
    * `[tagStart, tagEnd)`, entity-decoded; null if absent. */
  private[functions] def attrValue(in: String, tagStart: Int, tagEnd: Int,
                                   attr: String): String = {
    var j = tagStart + 1
    // skip tag name
    while (j < tagEnd && in.charAt(j) != ' ' && in.charAt(j) != '\t' &&
        in.charAt(j) != '\n' && in.charAt(j) != '\r' && in.charAt(j) != '>') j += 1
    while (j < tagEnd) {
      while (j < tagEnd && " \t\n\r/".indexOf(in.charAt(j)) >= 0) j += 1
      val nameStart = j
      while (j < tagEnd && "= \t\n\r>/\"'".indexOf(in.charAt(j)) < 0) j += 1
      if (j == nameStart) { j += 1 }
      else {
        val name = in.substring(nameStart, j)
        var k = j
        while (k < tagEnd && (in.charAt(k) == ' ' || in.charAt(k) == '\t' ||
            in.charAt(k) == '\n' || in.charAt(k) == '\r')) k += 1
        if (k < tagEnd && in.charAt(k) == '=') {
          k += 1
          while (k < tagEnd && (in.charAt(k) == ' ' || in.charAt(k) == '\t' ||
              in.charAt(k) == '\n' || in.charAt(k) == '\r')) k += 1
          val (value, after) =
            if (k < tagEnd && (in.charAt(k) == '"' || in.charAt(k) == '\'')) {
              val q = in.charAt(k)
              val e = in.indexOf(q, k + 1)
              val stop = if (e < 0 || e >= tagEnd) tagEnd - 1 else e
              (in.substring(k + 1, math.max(stop, k + 1)), stop + 1)
            } else {
              var e = k
              while (e < tagEnd && " \t\n\r>".indexOf(in.charAt(e)) < 0) e += 1
              (in.substring(k, e), e)
            }
          if (name.equalsIgnoreCase(attr)) return decodeEntities(value)
          j = after
        }
      }
    }
    null
  }

  private[functions] def decodeEntities(in: String): String = {
    if (in.indexOf('&') < 0) return in
    val n = in.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = in.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = in.indexOf(';', i + 1)
        val next = if (semi < 0 || semi - i > 10) -1 else semi
        val body = if (next > 0) in.substring(i + 1, next) else ""
        val decoded: String = body match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
          case b if b.length > 1 && b.charAt(0) == '#' =>
            numericEntity(b)
          case _ => null
        }
        if (decoded != null) { out.append(decoded); i = next + 1 }
        else { out.append('&'); i += 1 } // malformed: verbatim
      }
    }
    out.toString
  }

  private def numericEntity(b: String): String = try {
    val cp = if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
      Integer.parseInt(b.substring(2), 16)
    else Integer.parseInt(b.substring(1), 10)
    if (Character.isValidCodePoint(cp) && cp != 0)
      new String(Character.toChars(cp))
    else null
  } catch { case _: NumberFormatException => null }

  /** `[ \t\n\r\f ]+` → one space; trim. (nbsp collapses too — it is
    * layout, not content, once extracted.) */
  private def collapse(in: String): String = {
    val n = in.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = in.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
          c == '\u00a0') {
        if (out.length() > 0) pendingSpace = true
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
