package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size token blocks carved from offset `off` in one pass — the
  * fused form of the strip family's
  * `transform(sequence(0, greatest(nBlocks, 1) - 1),
  *   j => array_join(slice(split(text, " "), j*b + off + 1, b), " "))`.
  *
  * Why a kernel: higher-order functions are interpreted and re-evaluate
  * captured child expressions per element — the `split` inside the
  * lambda re-tokenized the whole document once per block, O(len²/b)
  * per doc (the r13 winnowSet finding's mechanism, caught by audit).
  *
  * The columnar identity that makes one pass possible: `split(text,
  * " ")` produces tokens (empties preserved) separated by EXACTLY one
  * 0x20 byte, so rejoining any contiguous token slice with " " is the
  * verbatim byte span of `text` between that slice's first token start
  * and last token end. Blocks here are therefore raw substrings — no
  * token materialization at all. 0x20 never occurs inside a multi-byte
  * UTF-8 sequence, so the byte scan is exact on any Unicode text.
  *
  * Bit-compat contract (spec-asserted, array equality):
  *  - numToks = #spaces + 1 (split("") = [""]);
  *  - tail = max(numToks - off, 0); nBlocks = (tail + b - 1) div b;
  *  - emits max(nBlocks, 1) blocks: block j covers tokens
  *    [off + j·b + 1, off + (j+1)·b] (1-based, truncated at the end);
  *    an out-of-range slice joins to "" — matching the columnar form's
  *    single empty block when the doc has ≤ off tokens.
  */
case class SpaceBlocks(child: Expression, b: Int, off: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "space_blocks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (b < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs block size >= 1, got $b")
    else if (off < 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs offset >= 0, got $off")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    SpaceBlocks.blocks(input.asInstanceOf[UTF8String], b, off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SpaceBlocks.blocks($c, $b, $off)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpaceBlocks {

  /** Tight-loop kernel; also called from generated code. */
  def blocks(s: UTF8String, b: Int, off: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    // token starts: position 0 and every byte after a 0x20
    var numToks = 1
    var i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, offset + i) == 0x20) numToks += 1
      i += 1
    }
    val tokStart = new Array[Int](numToks)
    val tokEnd = new Array[Int](numToks)
    tokStart(0) = 0
    var t = 0
    i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, offset + i) == 0x20) {
        tokEnd(t) = i
        t += 1
        tokStart(t) = i + 1
      }
      i += 1
    }
    tokEnd(t) = numBytes
    val tail = math.max(numToks - off, 0)
    val nBlocks = (tail + b - 1) / b
    val emit = math.max(nBlocks, 1)
    val out = new Array[Any](emit)
    var j = 0
    while (j < emit) {
      val first = off + j * b          // 0-based first token index
      val last = math.min(first + b, numToks) - 1
      out(j) =
        if (first >= numToks) UTF8String.EMPTY_UTF8
        else UTF8String.fromBytes({
          val from = tokStart(first)
          val len = tokEnd(last) - from
          val a = new Array[Byte](len)
          Platform.copyMemory(base, offset + from,
            a, Platform.BYTE_ARRAY_OFFSET, len)
          a
        })
      j += 1
    }
    new GenericArrayData(out)
  }
}
