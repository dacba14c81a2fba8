package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 values of a string's character n-gram shingles in
  * one pass over the UTF-8 buffer — the fused form of
  * `xxhash64(explode(Dedup.charShingles(text, n)))`.
  *
  * The composable form materializes one substring per window position
  * before hashing; at corpus scale that allocation dominates
  * shingle-join operators like `Dedup.decontaminate`. This expression
  * hashes each char-aligned byte window in place (XXH64 over the
  * window's UTF-8 bytes, seed 42 — identical to Spark's
  * `xxhash64(substring)`, asserted bit-equal in DedupSpec) and dedups
  * by sort, so the output is the ascending hash set. Callers treat it
  * as a set; only set membership and size are meaningful.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  /** Tight-loop kernel; also called from generated code. */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    // char start offsets (+ sentinel), identical walk to MinHashSignature
    var numChars = 0
    var i = 0
    while (i < numBytes) {
      i += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, offset + i))
      numChars += 1
    }
    val starts = new Array[Int](numChars + 1)
    i = 0
    var c = 0
    while (i < numBytes) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, offset + i))
      c += 1
    }
    starts(numChars) = numBytes

    val windows = math.max(numChars - n + 1, 1)
    val hs = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val from = starts(w)
      val to = starts(math.min(w + n, numChars))
      hs(w) = XXH64.hashUnsafeBytes(base, offset + from, to - from, 42L)
      w += 1
    }
    // dedup by sort: the output is a set, delivered ascending
    java.util.Arrays.sort(hs)
    var m = 0
    i = 1
    while (i < windows) {
      if (hs(i) != hs(m)) { m += 1; hs(m) = hs(i) }
      i += 1
    }
    new GenericArrayData(
      if (m + 1 == windows) hs else java.util.Arrays.copyOf(hs, m + 1))
  }
}
