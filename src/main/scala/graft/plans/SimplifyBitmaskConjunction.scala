package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, BitwiseAnd, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: fold conjunctions of zero-tests on bit-masks of the
  * same column into a single test —
  * `(qa & m) = 0 AND (qa & n) = 0  ⇒  (qa & (m|n)) = 0`.
  *
  * This is the QA-bitmask idiom the reference evaluates per pixel for
  * cloud/cirrus masking (`qa.bitwiseAnd(1<<10).eq(0)
  * .And(qa.bitwiseAnd(1<<11).eq(0))`, src/optimization.py:106-118;
  * preprocessing.py:81): at 100 TB halving the per-row bit tests in
  * the scan filter is real work saved, and stock Catalyst does not
  * perform this arithmetic rewrite. Runs in the user-provided
  * optimizer batch (after constant folding, so literal casts are
  * already collapsed).
  */
object SimplifyBitmaskConjunction extends Rule[LogicalPlan] {

  private object MaskZeroTest {
    /** Matches `(expr & lit) = 0` / `0 = (expr & lit)` with an
      * integer-typed literal mask; yields (column expr, mask). */
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case EqualTo(BitwiseAnd(x, Literal(m, t)), Literal(z, _)) if isZero(z) =>
        asLong(m, t).map(x -> _)
      case EqualTo(BitwiseAnd(Literal(m, t), x), Literal(z, _)) if isZero(z) =>
        asLong(m, t).map(x -> _)
      case EqualTo(Literal(z, _), BitwiseAnd(x, Literal(m, t))) if isZero(z) =>
        asLong(m, t).map(x -> _)
      case _ => None
    }
    private def isZero(v: Any): Boolean = v match {
      case 0 => true; case 0L => true; case _ => false
    }
    private def asLong(v: Any, t: Any): Option[Long] = (v, t) match {
      case (m: Int, IntegerType) => Some(m.toLong)
      case (m: Long, LongType) => Some(m)
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case And(MaskZeroTest(x1, m1), MaskZeroTest(x2, m2))
        if x1.semanticEquals(x2) && x1.dataType == LongType =>
      EqualTo(BitwiseAnd(x1, Literal(m1 | m2)), Literal(0L))
    case And(MaskZeroTest(x1, m1), MaskZeroTest(x2, m2))
        if x1.semanticEquals(x2) && x1.dataType == IntegerType =>
      EqualTo(BitwiseAnd(x1, Literal((m1 | m2).toInt)), Literal(0))
  }
}
