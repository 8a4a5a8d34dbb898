package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CosineSimilarity, L2Squared}

/** Engine extension point, installed with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`:
  *
  *  - `cosine_sim(a, b)` — native codegen'd cosine similarity
  *    ([[graft.expressions.CosineSimilarity]]) available from SQL and
  *    `expr(...)`.
  *  - [[SimplifyBitmaskConjunction]] — QA-bitmask conjunction folding
  *    in the optimizer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_sq"),
      (children: Seq[Expression]) => L2Squared(children(0), children(1))))
    ext.injectOptimizerRule(_ => SimplifyBitmaskConjunction)
  }
}
