package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint — the fused form of
  * `aggregate(transform(sequence(1, greatest(length(text), 1)),
  *    i => ascii(substring(text, i, 1)).cast("long")),
  *  0L, (acc, c) => (acc * 31 + c) % 1000000007)`.
  *
  * Why a kernel (r15 optimization round): the HOF form pays twice —
  * `substring(text, i, 1)` seeks from the string START each call
  * (UTF-8 offsets are not random-access), so the walk is O(len²)
  * BYTE scans per document, and the transform/aggregate pair is
  * interpreted (CodegenFallback) with per-element Long boxing.
  * One pass here.
  *
  * Bit-compat contract (spec-asserted vs the HOF form on arbitrary
  * Unicode): Spark's `ascii` returns the full Unicode CODE POINT of
  * the first character (probed: 'é' → 233, '日' → 26085, '𝄞' →
  * 119070; 0 for empty), and `substring(text, i, 1)` slices by code
  * point — so the fold visits each code point's value in order.
  * Empty text → the one forced sequence element yields ascii("") = 0
  * → fingerprint 0. The modulus keeps acc < 2³¹ so acc*31+c never
  * overflows a long; Java `%` matches Catalyst's Remainder exactly.
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    Fingerprint.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Fingerprint.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint {

  private val MOD = 1000000007L

  /** Tight-loop kernel; also called from generated code. One pass,
    * decoding each UTF-8 sequence to its code point (inputs are valid
    * UTF-8 by Spark's string invariant). */
  def fold(s: UTF8String): Long = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < numBytes) {
      val b = Platform.getByte(base, offset + i) & 0xff
      var cp = 0
      var len = 1
      if (b < 0x80) cp = b
      else if ((b & 0xe0) == 0xc0) { cp = b & 0x1f; len = 2 }
      else if ((b & 0xf0) == 0xe0) { cp = b & 0x0f; len = 3 }
      else { cp = b & 0x07; len = 4 }
      var k = 1
      while (k < len && i + k < numBytes) {
        cp = (cp << 6) | (Platform.getByte(base, offset + i + k) & 0x3f)
        k += 1
      }
      acc = (acc * 31L + cp.toLong) % MOD
      i += len
    }
    // zero code points: the HOF's greatest(…, 1) forces one element
    // whose ascii("") is 0 → (0*31 + 0) % MOD = 0 — same as acc here
    acc
  }
}
