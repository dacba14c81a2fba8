package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused vector-similarity Catalyst expression with whole-stage
  * codegen.
  *
  * The composable form (`zip_with` + `aggregate`, see
  * graft.functions.Similarity) materializes an intermediate products
  * array per row pair; on an ANN scoring path that's the hot loop. This
  * expression computes dot / cosine in a single pass over the two
  * ArrayData buffers with no allocation — the "custom Expression beats
  * UDF beats everything else" tier for operators Spark's built-ins
  * can't fuse (SURVEY §4 north-star note).
  *
  * metric: "dot" → Σ aᵢbᵢ; "cosine" → Σ aᵢbᵢ / (‖a‖‖b‖) (0.0 when a
  * norm is zero). Accepts array<float> or array<double> on both sides.
  */
case class VectorSimilarity(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"vector_$metric"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) =>
        if (metric == "dot" || metric == "cosine") TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"unknown metric $metric")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two arrays of float or double, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  private def leftIsFloat: Boolean = elemType(left).contains(FloatType)
  private def rightIsFloat: Boolean = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = leftIsFloat; val rf = rightIsFloat
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val u = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val v = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += u * v; nx += u * u; ny += v * v; i += 1
    }
    if (metric == "dot") dot
    else {
      val d = math.sqrt(nx) * math.sqrt(ny)
      if (d == 0.0) 0.0 else dot / d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val getL = if (leftIsFloat) "getFloat" else "getDouble"
      val getR = if (rightIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val u = ctx.freshName("u")
      val v = ctx.freshName("v"); val d = ctx.freshName("d")
      val finish =
        if (metric == "dot") s"${ev.value} = $dot;"
        else
          s"""double $d = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
             |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;""".stripMargin
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $u = (double) $x.$getL($i);
         |  double $v = (double) $y.$getR($i);
         |  $dot += $u * $v; $nx += $u * $u; $ny += $v * $v;
         |}
         |$finish
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
