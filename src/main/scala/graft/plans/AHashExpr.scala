package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual average-hash (aHash) of a binary payload — the
  * locality-preserving fingerprint behind
  * [[graft.functions.Multimodal.mediaNearDupPairs]]: near-identical
  * payloads (a few flipped bytes, a re-encoded header) land within a
  * small Hamming distance while unrelated payloads differ in ~bits/2
  * positions, which is what makes `md5(content)` exact dedup blind to
  * them and this hash pair-able by the simhash pigeonhole machinery.
  *
  * Classic aHash is "downscale, then bit = cell > mean". Here the
  * "downscale" is the byte-stat decode the multimodal seam already
  * defines (no media libs in this environment): byte p (0-based)
  * belongs to cell `p * bits / n` (integer division — `bits`
  * contiguous, near-equal cells), and bit i is set iff cell i's mean
  * byte value exceeds the whole payload's mean. The comparison is the
  * exact integer cross-multiplication
  * `cellSum_i * n > totalSum * cellLen_i` — no division, no floats,
  * so the WHOLE hash replays bit-identically in any SQL engine
  * (the q_media_neardup oracle rebuilds it in DuckDB from hex()).
  *
  * `bits` ≤ 60 keeps the assembled value oracle-replayable (DuckDB's
  * BIGINT `<<` throws at shift 63 — the q_simhash 60-bit precedent);
  * the Scala side accepts up to 64. Empty/absent payloads hash to 0.
  * Cross-multiplication bound: products reach 255·n²/bits, so `n` is
  * capped where that leaves the signed-64 range (~1 GiB at bits=60) —
  * shard larger payloads first (video frames already arrive chunked
  * via frameSample).
  */
case class AHash(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ahash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary input, got ${child.dataType.catalogString}")
    else if (bits < 1 || bits > 64) TypeCheckResult.TypeCheckFailure(
      s"$prettyName bits must be in [1, 64], got $bits")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    AHash.hash(input.asInstanceOf[Array[Byte]], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AHash.hash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHash {

  /** Tight-loop kernel; also called from generated code. */
  def hash(bytes: Array[Byte], bits: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    // 255 * n * (n/bits + 1) must stay inside signed 64 for the
    // cross-multiplied mean comparison below
    require(255.0 * n * (n.toDouble / bits + 1.0) < 9.0e18,
      s"ahash payload of $n bytes overflows the exact mean comparison " +
        s"at bits=$bits - shard/chunk payloads this large first")
    val cellSum = new Array[Long](bits)
    val cellLen = new Array[Long](bits)
    var total = 0L
    var p = 0
    while (p < n) {
      val c = (p.toLong * bits / n).toInt
      val v = (bytes(p) & 0xff).toLong
      cellSum(c) += v
      cellLen(c) += 1L
      total += v
      p += 1
    }
    var fp = 0L
    var i = 0
    while (i < bits) {
      if (cellSum(i) * n > total * cellLen(i)) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
