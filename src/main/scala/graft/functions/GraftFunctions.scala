package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's native expressions, two ways:
  *  - `GraftFunctions.register(spark)` on a live session;
  *  - `--conf spark.sql.extensions=graft.GraftSessionExtensions` at launch
  *    (the `SparkSessionExtensions` injection path).
  * After either, `SELECT simhash64(tokens), gamma_cdf(x, shape),
  * probit(p)` work from plain SQL.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (exprs => SimHash64(exprs.head)),
    "nfc_normalize" -> (exprs => NfcNormalize(exprs.head)),
    "html_text" -> (exprs => HtmlTextExtract(exprs.head)),
    "url_normalize" -> (exprs => UrlNormalizeExpr(exprs.head)),
    "robots_match" -> (exprs => RobotsMatchExpr(exprs.head, exprs(1))),
    "charset_sniff" -> (exprs => CharsetSniffExpr(exprs.head)),
    "html_links" -> (exprs => HtmlLinksExpr(exprs.head)),
    "html_anchors" -> (exprs => HtmlAnchorsExpr(exprs.head)),
    "gamma_cdf" -> (exprs => GammaCdf(exprs.head, exprs(1))),
    "probit"    -> (exprs => Probit(exprs.head)),
    "gamma_mle_shape" -> (exprs => GammaMleShape(exprs.head)),
    "sorted_intersect_count" -> (exprs => SortedIntersectCount(exprs.head, exprs(1))),
    "float_dot" -> (exprs => FloatDotProduct(exprs.head, exprs(1))),
    "gamma_ppf" -> (exprs => GammaPInv(exprs.head, exprs(1))),
    "log_gamma" -> (exprs => LogGamma(exprs.head)),
    "minhash_sig" -> (exprs => MinHashSig(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue())),
    "mg_sketch" -> (exprs => MisraGries(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue())),
    "utci_offset" -> (exprs => graft.indices.UtciOffset(
      exprs.head, exprs(1), exprs(2), exprs(3))),
    // r11 normalizers + generators, and the blocklist scan (its pattern
    // list is a plan-time constant, like the Column-API form)
    "winnow_normalize" -> (exprs => WinnowNormalizeExpr(exprs.head)),
    "lower_collapse_ws" -> (exprs => LowerCollapseWsExpr(exprs.head)),
    "winnow_explode" -> (exprs => WinnowExplodeExpr(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue(),
      257L, 2147483647L, 1L << 20)),
    "rolling_hash_explode" -> (exprs => RollingHashExplodeExpr(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(), 257L, 2147483647L)),
    "shingle_explode" -> (exprs => ShingleExplodeExpr(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(), distinct = false)),
    "ac_scan" -> (exprs => AhoCorasickExpr(exprs.head, {
      val arr = exprs(1).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until arr.numElements()).map(i =>
        arr.getUTF8String(i).toString)
    })))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
