package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct char n-gram shingle STRINGS in one pass over the UTF-8
  * buffer — the string-emitting sibling of [[ShingleHashes]] and the
  * fused form of
  * `array_distinct(transform(sequence(1, greatest(length(text)-(n-1), 1)),
  *    i => substring(text, i, n)))`.
  *
  * Why a kernel (r15 optimization round): `substring(text, i, n)`
  * seeks code-point i from the string START on every call (UTF-8
  * offsets are not random-access), so the columnar walk is O(len²)
  * byte scans per document. One pass here: code-point starts are
  * collected once, each window is one bounded byte copy.
  *
  * Bit-compat contract (spec-asserted, array equality):
  *  - windows slice by CODE POINT (supplementary-plane safe);
  *  - 0 chars → [""] (the forced single sequence element);
  *  - fewer than n chars → ONE truncated gram = the whole text;
  *  - dedup preserves FIRST-OCCURRENCE order (array_distinct
  *    semantics) — a drop-in twin, not set-equal-only. */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    CharShingles.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharShingles.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {

  /** Tight-loop kernel; also called from generated code. */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    // code-point start byte offsets (+ sentinel end)
    var numChars = 0
    var i = 0
    while (i < numBytes) {
      if ((Platform.getByte(base, offset + i) & 0xc0) != 0x80) numChars += 1
      i += 1
    }
    if (numChars == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val starts = new Array[Int](numChars + 1)
    i = 0
    var c = 0
    while (i < numBytes) {
      if ((Platform.getByte(base, offset + i) & 0xc0) != 0x80) {
        starts(c) = i; c += 1
      }
      i += 1
    }
    starts(numChars) = numBytes
    val windows = math.max(numChars - n + 1, 1)
    val seen = new java.util.HashSet[UTF8String](windows * 2)
    val out = new Array[Any](windows)
    var m = 0
    var w = 0
    while (w < windows) {
      val from = starts(w)
      val until = starts(math.min(w + n, numChars))
      val len = until - from
      val buf = new Array[Byte](len)
      Platform.copyMemory(base, offset + from,
        buf, Platform.BYTE_ARRAY_OFFSET, len)
      val g = UTF8String.fromBytes(buf)
      if (seen.add(g)) { out(m) = g; m += 1 }
      w += 1
    }
    new GenericArrayData(
      if (m == windows) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m)
        .asInstanceOf[Array[Any]])
  }
}
