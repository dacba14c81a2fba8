package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual difference-hash (dHash) of a binary payload — the
  * GRADIENT fingerprint complementing [[AHash]]'s brightness-mean one:
  * the payload splits into `bits + 1` contiguous near-equal cells and
  * bit i is set iff cell i's mean byte value exceeds cell i+1's (the
  * classic 9×8 "is this pixel brighter than its right neighbor"
  * grid, flattened to the byte-stat decode this environment's
  * multimodal seam defines). aHash is structurally blind to a
  * brightness RAMP (a gradient overlay shifts the global mean and
  * flips the low/high cells wholesale) while adjacent-cell
  * differences barely move — the standard reason perceptual pipelines
  * ship both (spec-asserted: a ramp-shifted payload pairs under dHash
  * and not under aHash).
  *
  * The comparison is the exact integer cross-multiplication
  * `cellSum_i · cellLen_{i+1} > cellSum_{i+1} · cellLen_i` — no
  * division, no floats, so the hash replays bit-identically in any
  * SQL engine (the q_media_dhash oracle rebuilds it in DuckDB from
  * unicode(substr) — payload stand-ins are ASCII). Products are
  * bounded by 255·(n/(bits+1)+1)², far inside signed-64 for any
  * frame-sized payload; the require mirrors [[AHash]]'s contract.
  * `bits` ≤ 60 keeps the assembled value oracle-replayable (DuckDB
  * BIGINT `<<` throws at 63); empty/absent payloads hash to 0.
  */
case class DHash(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary input, got ${child.dataType.catalogString}")
    else if (bits < 1 || bits > 64) TypeCheckResult.TypeCheckFailure(
      s"$prettyName bits must be in [1, 64], got $bits")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    DHash.hash(input.asInstanceOf[Array[Byte]], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DHash.hash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHash {

  /** Tight-loop kernel; also called from generated code. */
  def hash(bytes: Array[Byte], bits: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cells = bits + 1
    // cross-multiplied products reach 255 * (n/cells + 1)^2
    val w = n.toDouble / cells + 1.0
    require(255.0 * w * w < 9.0e18,
      s"dhash payload of $n bytes overflows the exact mean comparison " +
        s"at bits=$bits - shard/chunk payloads this large first")
    val cellSum = new Array[Long](cells)
    val cellLen = new Array[Long](cells)
    var p = 0
    while (p < n) {
      val c = (p.toLong * cells / n).toInt
      cellSum(c) += (bytes(p) & 0xff).toLong
      cellLen(c) += 1L
      p += 1
    }
    var fp = 0L
    var i = 0
    while (i < bits) {
      // empty cells (n < cells) have sum=len=0: 0 > 0 is false both
      // ways, so short payloads degrade to 0-bits deterministically
      if (cellSum(i) * cellLen(i + 1) > cellSum(i + 1) * cellLen(i)) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
