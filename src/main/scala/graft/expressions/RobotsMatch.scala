package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `robots_match(path, pattern)` — RFC 9309 rule-pattern match as a
  * native codegen'd Catalyst expression. The robots decision join is
  * URL-scale (every crawled URL × its host's bounded rule set), and
  * `path RLIKE regex` with a non-foldable pattern column compiles a
  * `java.util.regex.Pattern` PER ROW — a scale-killer the round-15
  * review flagged. The RFC grammar is only literal segments, `*`
  * wildcards, and one trailing `$` anchor, so
  * [[graft.sources.RobotsCodec.matches]] matches it directly with
  * greedy segment placement: no compilation, no backtracking, no
  * allocation beyond the pattern split. Stays inside whole-stage
  * codegen via a static call (the [[CosineSimilarity]] discipline).
  * Null path or pattern → null (standard binary-expression null
  * semantics); an EMPTY pattern matches nothing per the RFC. */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_match expects (STRING, STRING), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_match"
  override protected def nullSafeEval(path: Any, pat: Any): Any =
    RobotsMatch.matches(path.asInstanceOf[UTF8String],
      pat.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, q) => s"graft.expressions.RobotsMatch.matches($p, $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)
}

object RobotsMatch {
  /** Static codegen target: UTF8String → String is unavoidable here
    * (segment search is char-based), but the strings are short paths
    * and patterns — no Pattern compilation, the cost RLIKE pays. */
  def matches(path: UTF8String, pat: UTF8String): Boolean =
    graft.sources.RobotsCodec.matches(path.toString, pat.toString)
}
