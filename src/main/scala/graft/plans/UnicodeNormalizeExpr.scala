package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column — the
  * first pass of corpus text cleaning (ftfy-style mojibake repair is
  * out of scope; canonical/compatibility composition is the part with
  * a JDK-exact, engine-portable definition). Spark has no builtin for
  * this; a scala UDF would box and break codegen spans, so it is a
  * Catalyst expression whose generated code calls the static kernel
  * directly.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that avoids
  * the allocate-and-rebuild for already-normalized text — at corpus
  * scale virtually all ASCII/NFC input takes it, so the common-case
  * cost is one pass with no allocation (the UTF8String is returned
  * as-is). The `form` is validated at analysis time, not per row.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalize.Forms.mkString(",")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.plans.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Kernel; also called from generated code. Returns the input
    * object unchanged (no copy) when already normalized. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
