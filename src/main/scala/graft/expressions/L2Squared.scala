package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd squared Euclidean distance over two
  * `ARRAY<FLOAT>` columns — the distance kernel of the PQ / k-means /
  * KNN family, as one fused loop inside whole-stage codegen
  * (companion to [[CosineSimilarity]]; SURVEY §7.2's "custom
  * Expression only where profiling demands" path). On equal-length
  * arrays with non-null elements — the embedding-column invariant
  * every caller in this engine upholds — results are bit-equal to
  * the declarative `aggregate(zip_with(a, b, (x,y) -> pow(x-y,2)))`
  * fold: same left-to-right accumulation, same float→double widening
  * per element (pinned by CatalystExtensionsSpec).
  *
  * Outside that invariant the conventions differ from the fold (which
  * yields NULL): like [[CosineSimilarity]], null elements count as
  * 0.0f and mismatched lengths truncate to the common prefix; the
  * result is never null for non-null array inputs.
  */
case class L2Squared(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects ARRAY<FLOAT> inputs, got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv: Float = if (x.isNullAt(i)) 0.0f else x.getFloat(i)
      val yv: Float = if (y.isNullAt(i)) 0.0f else y.getFloat(i)
      val d = xv.toDouble - yv.toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per instance: two l2_sq (or l2_sq + cosine_sim) in one
      // codegen scope must not declare duplicate Java locals
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $x = $a.isNullAt($i) ? 0.0f : $a.getFloat($i);
         |  float $y = $b.isNullAt($i) ? 0.0f : $b.getFloat($i);
         |  double $d = (double) $x - (double) $y;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}
