package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer with a FIXED merge table (the GPT-2
  * `merges.txt` convention: rank r merges the pair on line r; lower rank
  * merges first). Text is whitespace-pre-tokenized, each word starts as
  * its character sequence, and the standard BPE loop repeatedly merges
  * the LOWEST-RANK adjacent pair present anywhere in the word (leftmost
  * occurrence — ranks are unique so ties only arise between positions).
  * Output is the flattened token array across words.
  *
  * Deterministic and engine-portable: the loop's trajectory is a pure
  * function of (text, merges), so an external SQL engine replays it with
  * a recursive CTE over the same literal merge list — the oracle for
  * `q_bpe_tokens` does exactly that. The merge table is a plan-time
  * constant (broadcast inside the serialized expression, like a
  * tokenizer vocab shipped to executors); per-row work is one JVM loop,
  * no Column-lambda re-traversals. Evaluated via CodegenFallback — the
  * kernel is a tight loop on primitive arrays, and tokenization cost is
  * dominated by the merge search, not the eval dispatch. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs STRING, got $other")
  }
  @transient private lazy val rankOf: Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val words = text.trim.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        // split by CODEPOINT, not UTF-16 code unit: non-BMP characters
        // (emoji, supplementary CJK) would otherwise become unpaired
        // surrogates that UTF8String turns into replacement bytes,
        // diverging from a codepoint-splitting oracle
        var toks = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        var done = false
        while (!done && toks.length > 1) {
          var best = Int.MaxValue; var at = -1
          var i = 0
          while (i < toks.length - 1) {
            val r = rankOf.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
            if (r < best) { best = r; at = i }
            i += 1
          }
          if (at < 0) done = true
          else {
            val merged = new Array[String](toks.length - 1)
            System.arraycopy(toks, 0, merged, 0, at)
            merged(at) = toks(at) + toks(at + 1)
            System.arraycopy(toks, at + 2, merged, at + 1, toks.length - at - 2)
            toks = merged
          }
        }
        toks.foreach(t => out += UTF8String.fromString(t))
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), merges))
}
