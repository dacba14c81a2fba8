package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ADC lookup table for a PQ query vector: m × ksub exact squared-L2
  * sub-distances (lut[j][c] = ‖q_sub_j − codebook_j_c‖²). The
  * query-side half of [[PqEncode]] — same reference-object codebooks,
  * same reason to exist (the columnar twin's literal-heavy generated
  * code is Janino-compile-bound, and the LUT expression appears in
  * every PQ search plan, twice in the re-ranked form). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double>, got ${child.dataType.catalogString}")
    else if (codebooks.isEmpty || codebooks.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(s"$prettyName codebooks must be non-empty")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val isFloat = elemType.contains(FloatType)

  protected override def nullSafeEval(input: Any): Any =
    PqLut.lut(input.asInstanceOf[ArrayData], isFloat, codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.PqLut.lut($c, $isFloat, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqLut {

  /** Kernel; also called from generated code. */
  def lut(v: ArrayData, isFloat: Boolean,
          cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val rows = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val sub = cb(j)
      val base = j * dsub
      val dists = new Array[Double](sub.length)
      var c = 0
      while (c < sub.length) {
        val cent = sub(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) v.getFloat(base + i).toDouble else v.getDouble(base + i)
          val diff = x - cent(i)
          d += diff * diff
          i += 1
        }
        dists(c) = d
        c += 1
      }
      rows(j) = new GenericArrayData(dists)
      j += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}
