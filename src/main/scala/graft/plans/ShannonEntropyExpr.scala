package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a string's code-point or whitespace-token
  * distribution in one pass — the kernel behind
  * [[graft.functions.TextFunctions.charEntropy]] / `tokenEntropy`.
  *
  * Computes H = ln(N) − (Σ c·ln(c)) / N over run lengths of the
  * SORTED element sequence, accumulating in the identical order to the
  * columnar `sort_array` + run-length `aggregate` fold it replaces
  * (code points sort numerically = UTF-8 byte order; tokens sort by
  * unsigned-byte comparison = Spark's string ordering) and with the
  * SAME log: Catalyst's `log()` is StrictMath.log, NOT Math.log —
  * they differ by 1 ulp on some arguments (ln(3), found the hard
  * way). Result is bit-identical to the columnar form —
  * spec-asserted. The columnar
  * fold was interpretation-bound: one lambda frame per element per row
  * (measured 4.7 s at sf0.1 where this kernel is ~0.4 s). Clamped to
  * +0.0 when N = 0 or fp residue lands at or below zero (the all-equal
  * case computes ln(n) − (n·ln(n))/n, within an ulp of ±0.0). */
case class ShannonEntropy(child: Expression, overTokens: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shannon_entropy"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    ShannonEntropy.entropy(input.asInstanceOf[UTF8String], overTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShannonEntropy.entropy($c, $overTokens)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShannonEntropy {

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // Java \s on ASCII

  /** Tight-loop kernel; also called from generated code. */
  def entropy(s: UTF8String, overTokens: Boolean): Double = {
    val bytes = s.getBytes
    val numBytes = bytes.length
    var acc = 0.0
    var n = 0L
    if (overTokens) {
      // token spans in one scan, sorted by unsigned-byte comparison
      // (Spark's UTF8String/string sort order)
      var count = 0
      var i = 0
      while (i < numBytes) {
        while (i < numBytes && isSpace(bytes(i))) i += 1
        if (i < numBytes) {
          count += 1
          while (i < numBytes && !isSpace(bytes(i))) i += 1
        }
      }
      if (count == 0) return 0.0
      val toks = new Array[UTF8String](count)
      i = 0
      var t = 0
      while (i < numBytes) {
        while (i < numBytes && isSpace(bytes(i))) i += 1
        if (i < numBytes) {
          val from = i
          while (i < numBytes && !isSpace(bytes(i))) i += 1
          toks(t) = UTF8String.fromBytes(bytes, from, i - from)
          t += 1
        }
      }
      java.util.Arrays.sort(toks,
        (a: UTF8String, b: UTF8String) => a.compareTo(b))
      n = count.toLong
      var run = 1L
      var k = 1
      while (k < count) {
        if (toks(k) == toks(k - 1)) run += 1
        else { acc += run * java.lang.StrictMath.log(run.toDouble); run = 1L }
        k += 1
      }
      acc += run * java.lang.StrictMath.log(run.toDouble)
    } else {
      // code points in one walk, sorted numerically (= UTF-8 byte
      // order for single code points)
      var numChars = 0
      var i = 0
      while (i < numBytes) {
        i += UTF8String.numBytesForFirstByte(bytes(i))
        numChars += 1
      }
      if (numChars == 0) return 0.0
      // pack each char's raw UTF-8 byte window big-endian into a LONG
      // (a 4-byte window overflows Int to negative): the packed value
      // preserves UTF-8 byte order, which is exactly the columnar
      // sort_array order on single-char strings
      val cps = new Array[Long](numChars)
      i = 0
      var c = 0
      while (i < numBytes) {
        val w = UTF8String.numBytesForFirstByte(bytes(i))
        var v = (bytes(i) & 0xff).toLong
        var j = 1
        while (j < w) { v = (v << 8) | (bytes(i + j) & 0xff); j += 1 }
        cps(c) = v
        c += 1
        i += w
      }
      java.util.Arrays.sort(cps)
      n = numChars.toLong
      var run = 1L
      var k = 1
      while (k < numChars) {
        if (cps(k) == cps(k - 1)) run += 1
        else { acc += run * java.lang.StrictMath.log(run.toDouble); run = 1L }
        k += 1
      }
      acc += run * java.lang.StrictMath.log(run.toDouble)
    }
    val h = java.lang.StrictMath.log(n.toDouble) - acc / n.toDouble
    if (h <= 0.0) 0.0 else h
  }
}
