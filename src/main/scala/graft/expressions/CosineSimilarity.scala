package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `ARRAY<FLOAT>` columns.
  *
  * Semantically identical to the declarative
  * `aggregate(zip_with(...))` fold in [[graft.functions.VectorOps]]
  * (same left-to-right accumulation order, same float→double
  * widening), but a single fused loop: no intermediate zipped array,
  * no per-element lambda dispatch, and it stays inside whole-stage
  * codegen. This is the SURVEY §7.2 "custom Expression only where
  * profiling demands" escape hatch — brute-force ANN scans are the
  * hot loop at 100 TB (eval/knn.py is the reference's equivalent).
  *
  * Null elements count as 0.0f; a zero norm on either side yields
  * NULL (the divide-guard convention used across the engine).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects ARRAY<FLOAT> inputs, got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv: Float = if (x.isNullAt(i)) 0.0f else x.getFloat(i)
      val yv: Float = if (y.isNullAt(i)) 0.0f else y.getFloat(i)
      dot += xv.toDouble * yv.toDouble
      na += xv.toDouble * xv.toDouble
      nb += yv.toDouble * yv.toDouble
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per instance: two cosine_sim (or cosine_sim + l2_sq)
      // in one codegen scope must not declare duplicate Java locals
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $x = $a.isNullAt($i) ? 0.0f : $a.getFloat($i);
         |  float $y = $b.isNullAt($i) ? 0.0f : $b.getFloat($i);
         |  $dot += (double) $x * (double) $y;
         |  $na += (double) $x * (double) $x;
         |  $nb += (double) $y * (double) $y;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
