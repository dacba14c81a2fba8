package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle STRINGS in one pass over the UTF-8
  * buffer — the string-emitting sibling of [[TokenShingleHashes]]
  * (same byte-scan tokenizer) and the fused form of
  * `array_distinct(transform(sequence(1, greatest(nTok-(n-1), 1)),
  *   i => concat_ws(" ", slice(toks, i, n))))` over
  * `toks = filter(split(text, "\\s+"), len > 0)`.
  *
  * Why a kernel: higher-order functions are interpreted (CodegenFallback)
  * and re-evaluate captured child EXPRESSIONS per element — a computed
  * `toks` (the split+filter) inside the `slice` lambda re-tokenizes the
  * whole document once per gram position, O(len²) per doc (the r13
  * winnowSet finding, same mechanism). One scan here; each gram is the
  * window's token bytes joined by single 0x20 separators — exactly the
  * `concat_ws(" ", …)` byte sequence.
  *
  * Bit-compat contract (spec-asserted, array equality):
  *  - whitespace = Java regex `\s` on ASCII (space, \t, \n, \x0B, \f,
  *    \r) — single UTF-8 bytes, never part of a multi-byte sequence;
  *  - fewer than n tokens → ONE gram of all tokens (slice truncation);
  *  - zero tokens → [""] (concat_ws over an empty slice);
  *  - dedup preserves FIRST-OCCURRENCE order (array_distinct
  *    semantics), so the kernel is a drop-in twin, not set-equal-only.
  */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    TokenShingles.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenShingles.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingles {

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Tight-loop kernel; also called from generated code. */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    var numToks = 0
    var i = 0
    while (i < numBytes) {
      while (i < numBytes && isSpace(Platform.getByte(base, offset + i))) i += 1
      if (i < numBytes) {
        numToks += 1
        while (i < numBytes && !isSpace(Platform.getByte(base, offset + i))) i += 1
      }
    }
    val tokStart = new Array[Int](numToks)
    val tokEnd = new Array[Int](numToks)
    i = 0
    var t = 0
    while (i < numBytes) {
      while (i < numBytes && isSpace(Platform.getByte(base, offset + i))) i += 1
      if (i < numBytes) {
        tokStart(t) = i
        while (i < numBytes && !isSpace(Platform.getByte(base, offset + i))) i += 1
        tokEnd(t) = i
        t += 1
      }
    }
    if (numToks == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val windows = math.max(numToks - n + 1, 1)
    val buf = new Array[Byte](numBytes)
    val seen = new java.util.HashSet[UTF8String](windows * 2)
    val out = new Array[Any](windows)
    var m = 0
    var w = 0
    while (w < windows) {
      val end = math.min(w + n, numToks)
      var len = 0
      var k = w
      while (k < end) {
        if (k > w) { buf(len) = 0x20; len += 1 }
        val tl = tokEnd(k) - tokStart(k)
        Platform.copyMemory(base, offset + tokStart(k),
          buf, Platform.BYTE_ARRAY_OFFSET + len, tl)
        len += tl
        k += 1
      }
      val g = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
      if (seen.add(g)) { out(m) = g; m += 1 }
      w += 1
    }
    new GenericArrayData(
      if (m == windows) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m)
        .asInstanceOf[Array[Any]])
  }
}
