package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash over whitespace tokens of a string.
  *
  * Walks the UTF-8 buffer once: tokens are maximal runs of
  * non-whitespace bytes, each hashed in place with XXH64 (seed 42 —
  * identical to xxhash64(token)); per hash, bit j contributes ±1 to 64
  * counters; the fingerprint sets bit j iff counter j > 0. Bit-compatible
  * with graft.functions.Dedup.simhashFingerprints over
  * TextFunctions.tokens (regex \s+) for ASCII whitespace — asserted in
  * DedupSpec.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    SimHash64.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Tight-loop fingerprint kernel; also called from generated code. */
  def fingerprint(s: UTF8String): Long = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    val counts = new Array[Int](64)
    var i = 0
    while (i < numBytes) {
      while (i < numBytes && isSpace(Platform.getByte(base, offset + i))) i += 1
      val start = i
      while (i < numBytes && !isSpace(Platform.getByte(base, offset + i))) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
