package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{Bf16ToFloats, CosineSimilarity, FloatsToBf16, FloatsToFp16, Fp16ToFloats, L2Squared, NfcNormalize, NfkcNormalize, RobotsMatch, StripAccents}

/** Engine extension point, installed with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`:
  *
  *  - `cosine_sim(a, b)` — native codegen'd cosine similarity
  *    ([[graft.expressions.CosineSimilarity]]) available from SQL and
  *    `expr(...)`.
  *  - `fp16_vec(binary)` / `fp16_pack(array<float>)` — IEEE binary16
  *    embedding wire-format pack/unpack ([[graft.expressions.Fp16]]);
  *    `bf16_vec` / `bf16_pack` — the bfloat16 training-side siblings
  *    ([[graft.expressions.Bf16]]).
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
    ext.injectFunction((
      new FunctionIdentifier("fp16_vec"),
      new ExpressionInfo(classOf[Fp16ToFloats].getName, "fp16_vec"),
      (children: Seq[Expression]) => Fp16ToFloats(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("fp16_pack"),
      new ExpressionInfo(classOf[FloatsToFp16].getName, "fp16_pack"),
      (children: Seq[Expression]) => FloatsToFp16(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("bf16_vec"),
      new ExpressionInfo(classOf[Bf16ToFloats].getName, "bf16_vec"),
      (children: Seq[Expression]) => Bf16ToFloats(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("bf16_pack"),
      new ExpressionInfo(classOf[FloatsToBf16].getName, "bf16_pack"),
      (children: Seq[Expression]) => FloatsToBf16(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("unicode_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "unicode_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("unicode_nfkc"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "unicode_nfkc"),
      (children: Seq[Expression]) => NfkcNormalize(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => StripAccents(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("robots_match"),
      new ExpressionInfo(classOf[RobotsMatch].getName, "robots_match"),
      (children: Seq[Expression]) => RobotsMatch(children(0), children(1))))
    ext.injectOptimizerRule(_ => SimplifyBitmaskConjunction)
  }
}
