package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass Unicode-script counter: per input string, the
  * code-point counts for the eight routing scripts in
  * [[graft.pipeline.TextStats.Scripts]] order (latin, cyrillic, han,
  * arabic, greek, hangul, hebrew, devanagari) plus total letters
  * (`\p{L}`) as element 9.
  *
  * Semantically identical to nine `regexp_count` passes over
  * single-code-point classes (`[\p{IsLatin}]` …, `[\p{L}]`): Java's
  * regex script classes bottom out in `Character.UnicodeScript.of`, and
  * `\p{L}` in `Character.isLetter` — the same JVM tables this kernel
  * calls directly. The regex formulation re-scans the document once per
  * class (9 passes, each paying regex-engine overhead per code point —
  * measured 2.7 s on q_script_profile at sf0.1); this is ONE scan with
  * a switch, inside whole-stage codegen via a static-call `doGenCode`.
  * Null string yields null. */
case class ScriptCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"script_counts needs STRING, got $other")
    }
  }
  override def nullSafeEval(input: Any): Any =
    ScriptCounts.compute(input.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptCounts.compute($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {
  import java.lang.Character.UnicodeScript

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: String): GenericArrayData = {
    val counts = new Array[Long](9)
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val sc = UnicodeScript.of(cp)
      if (sc eq UnicodeScript.LATIN) counts(0) += 1
      else if (sc eq UnicodeScript.CYRILLIC) counts(1) += 1
      else if (sc eq UnicodeScript.HAN) counts(2) += 1
      else if (sc eq UnicodeScript.ARABIC) counts(3) += 1
      else if (sc eq UnicodeScript.GREEK) counts(4) += 1
      else if (sc eq UnicodeScript.HANGUL) counts(5) += 1
      else if (sc eq UnicodeScript.HEBREW) counts(6) += 1
      else if (sc eq UnicodeScript.DEVANAGARI) counts(7) += 1
      if (Character.isLetter(cp)) counts(8) += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def scriptCounts(text: Column): Column =
    ColumnBridge.column(ScriptCounts(ColumnBridge.expression(text)))
}
