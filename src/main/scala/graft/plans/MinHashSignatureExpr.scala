package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over character n-grams of a string,
  * using ONE-PERMUTATION HASHING (Li/Owen/Zhang 2012) with rightward
  * rotation densification (Shrivastava/Li 2014) instead of k
  * independent permutations.
  *
  * Scheme (the bit-compat contract shared by all three forms — this
  * expression, the explode+agg [[graft.functions.Dedup.minhashSignatures]],
  * and the per-row [[graft.functions.Dedup.minhashSignature]]):
  * {{{
  *   h   = xxhash64(shingle)            // XXH64 over UTF-8 bytes, seed 42
  *   g   = xxhash64(h, seed)            // the two-arg seed chain
  *   bin = pmod(g, k)                   // floored modulus
  *   sig[j] = min{ g : bin(g) = j }     // one min per bin
  *   empty bin j copies the value of the nearest non-empty bin at or
  *   after j, scanning rightward cyclically (rotation densification)
  * }}}
  * Every shingle is hashed O(1) times instead of k — the earlier
  * k-permutation kernel ran 128 mix rounds per window and was the
  * dominant map-side cost of the LSH dedup family; this form does one
  * premixed mix + one floorMod per window. For J≈0.9 near-dup pairs
  * the two documents' fill patterns nearly coincide, so densified
  * positions match with probability ≈ J as well; the LSH paths
  * re-verify candidates with true Jaccard, so precision is unaffected
  * by the estimator change and banding recall is the only sensitivity
  * (re-profiled against the exact pair set at sf0.01/sf0.1 when this
  * scheme landed — see DedupSpec and the q_minhash_lsh oracle).
  *
  * Signatures are identical across the three forms — asserted in
  * DedupSpec (ASCII + multi-byte UTF-8).
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

  @transient private lazy val premixedSeed: Long =
    MinHashSignature.premixSeed(seed)

  protected override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[UTF8String], n, k, premixedSeed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashSignature.signature($c, $n, $k, ${premixedSeed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  // xxHash64 primes (public xxHash constants, identical to Spark's
  // catalyst XXH64) — the specialized mix below must stay bit-identical
  // to XXH64.hashLong(seed, h42); DedupSpec asserts equality against
  // Spark's own xxhash64 SQL function via the composable twin.
  private final val P1 = -7046029288634856825L
  private final val P2 = -4417276706812531889L
  private final val P3 = 1609587929392839161L
  private final val P4 = -8796714831421723037L
  private final val P5 = 2870177450012600261L

  /** The seed-dependent lane of `XXH64.hashLong(seed, h42)`, computed
    * once per expression instead of once per window:
    * {{{ hashLong(seed, h42) = fmix(rotl27((h42+P5+8) ^ k1) * P1 + P4)
    *     k1 = rotl31(seed * P2) * P1           // depends only on seed }}} */
  def premixSeed(seed: Long): Long =
    java.lang.Long.rotateLeft(seed * P2, 31) * P1

  /** Tight-loop OPH signature kernel; also called from generated code.
    * Takes [[premixSeed]] output, not the raw seed. */
  def signature(s: UTF8String, n: Int, k: Int, premixedSeed: Long): ArrayData = {
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

    val mins = new Array[Long](k)
    // explicit fill flags: a real minimum could legitimately equal any
    // sentinel value, so "empty" is tracked out of band
    val filled = new Array[Boolean](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val windows = math.max(numChars - n + 1, 1)
    var w = 0
    while (w < windows) {
      val from = starts(w)
      val to = starts(math.min(w + n, numChars))
      val h = XXH64.hashUnsafeBytes(base, offset + from, to - from, 42L)
      val h42 = XXH64.hashLong(h, 42L)
      // g = xxhash64(h, seed) = XXH64.hashLong(seed, h42) with the
      // seed lane premixed; fmix inlined (bit-identical, see premix doc)
      var g = java.lang.Long.rotateLeft((h42 + P5 + 8L) ^ premixedSeed, 27) * P1 + P4
      g ^= g >>> 33; g *= P2; g ^= g >>> 29; g *= P3; g ^= g >>> 32
      val b = java.lang.Math.floorMod(g, k) // == Spark SQL pmod(g, k)
      if (!filled(b) || g < mins(b)) { mins(b) = g; filled(b) = true }
      w += 1
    }
    // rotation densification: empty bin j takes the value of the
    // nearest non-empty bin at or after j, wrapping past k-1 to the
    // first non-empty bin. windows >= 1 guarantees one non-empty bin.
    var f = 0
    while (!filled(f)) f += 1
    var carry = mins(f)
    var j = k - 1
    while (j >= 0) {
      if (filled(j)) carry = mins(j) else mins(j) = carry
      j -= 1
    }
    new GenericArrayData(mins)
  }
}
