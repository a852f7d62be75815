package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as a native codegen'd expression — the dedup key
  * for crawl frontiers and per-domain corpus quotas: the same page is
  * crawled as `HTTP://Example.com:80/a/../b?utm_source=x&q=1#top` and
  * `http://example.com/b?q=1`, and un-normalized keys split its duplicate
  * group exactly like un-normalized Unicode does ([[NfcNormalize]]).
  *
  * Contract (RFC 3986 syntax-based normalization + crawl conventions):
  *   - scheme and host lowercase; default ports drop (:80 http, :443
  *     https); fragment drops;
  *   - percent-escapes of unreserved chars (ALPHA DIGIT - . _ ~) decode;
  *     all other escapes uppercase their hex; malformed '%' stays verbatim;
  *   - path dot-segments remove per RFC 3986 §5.2.4; empty path → "/";
  *   - query params split on '&'; tracking params drop (utm_*, gclid,
  *     fbclid, msclkid, ref, ref_src); survivors sort by (key, value)
  *     byte-lexicographically (a SET key: crawlers emit params in
  *     arbitrary order); empty query drops its '?';
  *   - inputs without "://" return unchanged (relative refs are resolved
  *     upstream against their WARC-Target-URI, not here); userinfo and
  *     IDN hosts pass through verbatim (documented non-goals).
  *
  * Never throws: crawl URLs are arbitrarily malformed and a per-row
  * exception would poison whole partitions; the worst input degrades to
  * best-effort string cleanup. Per-row, shuffle-free, codegen'd.
  */
case class UrlNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"url_normalize needs STRING, got $other")
  }
  override def nullSafeEval(s: Any): Any =
    UrlNormalize.normalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlNormalize.normalize($c)")
  override protected def withNewChildInternal(c: Expression): UrlNormalizeExpr =
    copy(child = c)
}

object UrlNormalize {

  private val DroppedParams =
    Set("gclid", "fbclid", "msclkid", "ref", "ref_src")

  def normalize(u: UTF8String): UTF8String = {
    val in = u.toString
    val sep = in.indexOf("://")
    if (sep <= 0) return u
    val out = new java.lang.StringBuilder(in.length)

    // scheme
    var i = 0
    while (i < sep) { out.append(Character.toLowerCase(in.charAt(i))); i += 1 }
    val scheme = out.toString
    out.append("://")
    i = sep + 3

    // authority: [userinfo@]host[:port]
    val authEnd = endOf(in, i, "/?#")
    val auth = in.substring(i, authEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) out.append(auth, 0, at + 1)
    val hostPort = auth.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && hostPort.drop(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    out.append(host.toLowerCase)
    if (port.nonEmpty &&
        !((scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443")))
      out.append(':').append(port)
    i = authEnd

    // path
    val pathEnd = endOf(in, i, "?#")
    val path = removeDotSegments(percentNormalize(in.substring(i, pathEnd)))
    out.append(if (path.isEmpty) "/" else path)
    i = pathEnd

    // query (fragment beyond it drops)
    if (i < in.length && in.charAt(i) == '?') {
      val qEnd = endOf(in, i + 1, "#")
      val kept = in.substring(i + 1, qEnd).split("&", -1).iterator
        .filter(_.nonEmpty)
        .map(percentNormalize)
        .filterNot { p =>
          val k = p.indexOf('=') match {
            case -1 => p
            case e => p.substring(0, e)
          }
          val kl = k.toLowerCase
          kl.startsWith("utm_") || DroppedParams.contains(kl)
        }
        .toArray
    // sort by (key, value): '=' sorts between '<' and '>' so whole-string
    // byte order equals (key, value) order except when one param is a
    // key-prefix of another's key — split-compare avoids that edge
      java.util.Arrays.sort(kept, paramOrder)
      if (kept.nonEmpty)
        out.append('?').append(String.join("&", kept: _*))
    }
    val res = out.toString
    if (res == in) u else UTF8String.fromString(res)
  }

  private val paramOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      private def split(p: String): (String, String) = p.indexOf('=') match {
        case -1 => (p, "")
        case e => (p.substring(0, e), p.substring(e + 1))
      }
      def compare(a: String, b: String): Int = {
        val (ak, av) = split(a); val (bk, bv) = split(b)
        val c = ak.compareTo(bk)
        if (c != 0) c else av.compareTo(bv)
      }
    }

  private def endOf(s: String, from: Int, stops: String): Int = {
    var j = from
    while (j < s.length && stops.indexOf(s.charAt(j)) < 0) j += 1
    j
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode %XX of unreserved chars; uppercase other escapes' hex;
    * malformed '%' passes verbatim. */
  private[functions] def percentNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) &&
          isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) out.append(v.toChar)
        else out.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[functions] def removeDotSegments(p: String): String = {
    if (p.indexOf('.') < 0) return p
    val out = new java.lang.StringBuilder(p.length)
    var in = p
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val slash = out.toString.lastIndexOf('/')
        out.setLength(if (slash < 0) 0 else slash)
      }
      else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val seg = if (next < 0) in else in.substring(0, next)
        out.append(seg)
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.toString
  }

  def urlNormalize(c: Column): Column =
    ColumnBridge.column(UrlNormalizeExpr(ColumnBridge.expression(c)))
}
