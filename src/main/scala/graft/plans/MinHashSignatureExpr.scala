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
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1, got $n")
    else if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val mixedSalts: Array[Long] =
    MinHashSignature.premixedSalts(MinHashSignature.salts(k, seed))

  protected override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[UTF8String], n, mixedSalts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("mixedSalts", mixedSalts, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashSignature.signature($c, $n, $saltsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  // xxHash64 primes (public xxHash constants, identical to Spark's
  // catalyst XXH64) — the specialized per-salt loop below must stay
  // bit-identical to XXH64.hashLong(salt, seed); DedupSpec asserts
  // equality against Spark's own xxhash64 SQL function.
  private final val P1 = -7046029288634856825L
  private final val P2 = -4417276706812531889L
  private final val P3 = 1609587929392839161L
  private final val P4 = -8796714831421723037L
  private final val P5 = 2870177450012600261L

  def salts(k: Int, seed: Long): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)(rnd.nextLong())
  }

  /** The salt-dependent lane of `XXH64.hashLong(salt, seed)`,
    * precomputed once per expression instead of once per (window × k):
    * {{{ hashLong(salt, seed) = fmix(rotl27((seed+P5+8) ^ k1) * P1 + P4)
    *     k1 = rotl31(salt * P2) * P1            // depends only on salt }}}
    * so the hot loop keeps only the seed-dependent half — 2 multiplies
    * and a rotate fewer per signature position per window. */
  def premixedSalts(salts: Array[Long]): Array[Long] = {
    val out = new Array[Long](salts.length)
    var j = 0
    while (j < salts.length) {
      out(j) = java.lang.Long.rotateLeft(salts(j) * P2, 31) * P1
      j += 1
    }
    out
  }

  /** Tight-loop signature kernel; also called from generated code.
    * Takes [[premixedSalts]] output, not raw salts. */
  def signature(s: UTF8String, n: Int, mixedSalts: Array[Long]): ArrayData = {
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

    val k = mixedSalts.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val windows = math.max(numChars - n + 1, 1)
    var w = 0
    while (w < windows) {
      val from = starts(w)
      val to = starts(math.min(w + n, numChars))
      val h = XXH64.hashUnsafeBytes(base, offset + from, to - from, 42L)
      val h42 = XXH64.hashLong(h, 42L)
      // mirror xxhash64(h, salt) = XXH64.hashLong(salt, h42) with the
      // salt lane premixed; fmix inlined (bit-identical, see premix doc)
      val hashBase = h42 + P5 + 8L
      var j = 0
      while (j < k) {
        var r = java.lang.Long.rotateLeft(hashBase ^ mixedSalts(j), 27) * P1 + P4
        r ^= r >>> 33; r *= P2; r ^= r >>> 29; r *= P3; r ^= r >>> 32
        if (r < mins(j)) mins(j) = r
        j += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
