package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over character n-grams of a string.
  *
  * The composable pipeline (charShingles → explode → k min-aggregates,
  * graft.functions.Dedup) materializes one substring per window
  * position and shuffles 128 aggregate buffers; profiled at sf0.1 that
  * is ~95% of the LSH runtime. This expression walks the UTF-8 buffer
  * once, hashing each char-aligned byte window in place (no substring
  * allocation, no explode, no shuffle — the signature is a map-side
  * projection).
  *
  * Bit-compatible with the composable form: window hash =
  * xxhash64(shingle) (XXH64 over the UTF-8 bytes, seed 42), position
  * mix = xxhash64(h, salt_i) (the two-arg seed chain), so both paths
  * produce identical signatures — asserted in DedupSpec.
  */
case class MinHashSignature(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  @transient private lazy val salts: Array[Long] = MinHashSignature.salts(k, seed)

  protected override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[UTF8String], n, salts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("salts", salts, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashSignature.signature($c, $n, $saltsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  def salts(k: Int, seed: Long): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)(rnd.nextLong())
  }

  /** Tight-loop signature kernel; also called from generated code. */
  def signature(s: UTF8String, n: Int, salts: Array[Long]): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    // char start offsets (+ sentinel) so windows stay char-aligned and
    // hash exactly the bytes xxhash64(substring(text, i, n)) would
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

    val k = salts.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val windows = math.max(numChars - n + 1, 1)
    var w = 0
    while (w < windows) {
      val from = starts(w)
      val to = starts(math.min(w + n, numChars))
      val h = XXH64.hashUnsafeBytes(base, offset + from, to - from, 42L)
      val h42 = XXH64.hashLong(h, 42L)
      var j = 0
      while (j < k) {
        // mirror xxhash64(h, salt): seed-chained long hashing
        val r = XXH64.hashLong(salts(j), h42)
        if (r < mins(j)) mins(j) = r
        j += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
