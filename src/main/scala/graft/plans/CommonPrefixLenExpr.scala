package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Length (in CODE POINTS) of the longest common prefix of two
  * strings — the match-extension primitive of the exact-substring
  * dedup family (`Dedup.duplicateSpanPairs`): a candidate seed
  * extends right via `lcp(suffixA, suffixB)` and left via the lcp of
  * the reversed prefixes. Code points, not UTF-16 units or bytes,
  * because every position in the family (gram starts, span starts,
  * lengths) is a `substring` position and both Spark's and DuckDB's
  * substring count code points — a byte or UTF-16 count would split
  * surrogate pairs and desynchronize the two engines.
  *
  * Kernel: byte-wise compare on the UTF-8 buffers (no allocation,
  * no decode), then trim the common run back to a code-point
  * boundary and count code points in it — UTF-8's self-synchronizing
  * property makes the byte-lcp-then-trim exactly the code-point lcp.
  * Extension runs only on candidate pairs (≈ true dup spans + hash
  * collisions — tiny by construction), but each call scans up to the
  * span length, so the flat byte loop matters. */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "common_prefix_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two string inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLen.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CommonPrefixLen.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {

  /** Kernel; also called from generated code. */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val na = a.numBytes()
    val nb = b.numBytes()
    val n = math.min(na, nb)
    var i = 0
    while (i < n && a.getByte(i) == b.getByte(i)) i += 1
    // trim a mid-code-point stop back to the last boundary: if the
    // mismatch landed inside a multi-byte sequence, that code point
    // differs between the strings and must not count
    if (i < na && i < nb) {
      while (i > 0 && (a.getByte(i) & 0xC0) == 0x80) i -= 1
    }
    // count code points in the common byte prefix (= non-continuation
    // bytes)
    var cp = 0
    var j = 0
    while (j < i) {
      if ((a.getByte(j) & 0xC0) != 0x80) cp += 1
      j += 1
    }
    cp
  }
}
