package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 (Robots Exclusion Protocol) path-pattern match as a native
  * codegen'd expression: does `path` match `pattern`, where the pattern
  * is an anchored-prefix match with `*` (any substring, including empty)
  * and a trailing `$` (end anchor). Examples from the RFC: `/foo*bar`
  * matches `/foox/bar`, `/fish$` matches only exactly `/fish`.
  *
  * Classic greedy glob scan with backtracking to the last star — O(n·m)
  * worst case on adversarial patterns, linear on real robots rules.
  * Per-row, shuffle-free; rule sets ride a broadcast join beside it
  * ([[graft.pipeline.Robots]]).
  */
case class RobotsMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"robots_match needs (STRING, STRING), got $other")
    }
  override def nullSafeEval(p: Any, pat: Any): Any =
    RobotsMatch.matches(p.asInstanceOf[UTF8String].toString,
      pat.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, pat) =>
      s"graft.functions.RobotsMatch.matches($p.toString(), $pat.toString())")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatchExpr =
    copy(left = newLeft, right = newRight)
}

object RobotsMatch {

  /** Anchored-at-start match of `path` against `pattern` with `*` and a
    * trailing `$`. An empty pattern matches everything (RFC: empty
    * Disallow = allow all is handled a level up — the MATCH itself is
    * vacuous-true). */
  def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var i = 0      // path pos
    var j = 0      // pattern pos
    var starJ = -1 // pattern pos after last '*'
    var starI = -1 // path pos the last '*' is currently pinned to
    val n = path.length
    val m = pat.length
    while (i < n) {
      if (!anchored && j == m) return true // prefix fully matched mid-path
      if (j < m && pat.charAt(j) == '*') { starJ = j + 1; starI = i; j += 1 }
      else if (j < m && pat.charAt(j) == path.charAt(i)) { i += 1; j += 1 }
      else if (starJ >= 0) { starI += 1; i = starI; j = starJ }
      else return false
    }
    // path exhausted: any trailing stars match empty; pattern must be done
    while (j < m && pat.charAt(j) == '*') j += 1
    j == m
  }

  def robotsMatch(path: Column, pattern: Column): Column =
    ColumnBridge.column(RobotsMatchExpr(
      ColumnBridge.expression(path), ColumnBridge.expression(pattern)))
}
