package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense matrix × vector: a dim-length float/double vector → the
  * rows-of-matrix dot products (array<double>, length = matrix rows).
  * The driver-held matrix rides as a plan reference object, exactly
  * like [[PqEncode]]'s codebooks — the composable twin (one
  * `dotFused`+literal per output row, `Similarity.pcaProject`'s shape)
  * inlines rows·dim literals into generated code, which is
  * Janino-COMPILE-bound for full-dim rotations (the repo's measured
  * literal-heavy-codegen gotcha). Used by the OPQ rotation apply,
  * where the rotation is dim×dim and sits on the full-corpus encode
  * path; pure projection, no shuffle. */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mat_vec"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double>, got ${child.dataType.catalogString}")
    else if (matrix.isEmpty || matrix.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(s"$prettyName matrix must be non-empty")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val isFloat = elemType.contains(FloatType)

  protected override def nullSafeEval(input: Any): Any =
    MatVec.apply(input.asInstanceOf[ArrayData], isFloat, matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matVecMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MatVec.apply($c, $isFloat, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVec {

  /** Kernel; also called from generated code. Rows shorter than the
    * input vector read a prefix; rows longer than the vector throw
    * LOUDLY — UnsafeArrayData does no bounds checking, so without
    * this guard a truncated/mixed-dim vector would read adjacent
    * buffer memory and produce silently wrong rotations. */
  def apply(v: ArrayData, isFloat: Boolean,
            m: Array[Array[Double]]): ArrayData = {
    val nElems = v.numElements()
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      if (row.length > nElems)
        throw new IllegalArgumentException(
          s"mat_vec: matrix row $r has ${row.length} columns but the input " +
            s"vector has $nElems elements")
      var s = 0.0
      var i = 0
      while (i < row.length) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += row(i) * x
        i += 1
      }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }
}
