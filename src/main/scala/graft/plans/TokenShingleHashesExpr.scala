package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 values of a string's WORD n-gram shingles in one
  * pass over the UTF-8 buffer — the fused form of
  * `transform(Dedup.tokenShingles(TextFunctions.tokens(text), n), xxhash64)`,
  * the word-gram twin of [[ShingleHashes]].
  *
  * The composable form materializes every joined n-gram STRING
  * (token array → slice → concat_ws per window) before hashing; at
  * corpus scale that allocation dominates `Dedup.decontaminateByTokens`
  * the same way char-gram substrings dominated `decontaminate` before
  * the char kernel landed. This kernel tokenizes by scanning the UTF-8
  * bytes once, assembles each window's joined bytes into one reusable
  * buffer (token bytes + single 0x20 separators — exactly the
  * `concat_ws(" ", ...)` byte sequence) and hashes it in place.
  *
  * Bit-compat contract (spec-asserted in DedupSpec, set equality):
  *  - whitespace = Java regex `\s` on ASCII — space, \t, \n, \x0B
  *    (vertical tab), \f, \r — the exact separator class of
  *    `TextFunctions.tokens`' `split(text, "\s+")`. All are single
  *    UTF-8 bytes and multi-byte sequences never contain bytes < 0x80,
  *    so the byte scan is exact on any Unicode text.
  *  - fewer than n tokens → ONE gram of all tokens (slice semantics);
  *  - zero tokens → the hash of the empty string (concat_ws over an
  *    empty slice), matching the composable form on whitespace-only
  *    and empty documents.
  * Output is the ascending distinct hash set; callers treat it as a
  * set (joins, overlap counts) — only membership and size are
  * meaningful.
  */
case class TokenShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    TokenShingleHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingleHashes {

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // Java \s on ASCII: " \t\n\x0B\f\r"

  /** Tight-loop kernel; also called from generated code. */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    // token boundaries (byte offsets) in one scan
    var numToks = 0
    var i = 0
    while (i < numBytes) { // count first to size the arrays exactly
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
    if (numToks == 0) {
      // concat_ws over an empty slice is "" — one empty-string hash
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, offset, 0, 42L)))
    }
    val windows = math.max(numToks - n + 1, 1)
    // one reusable window buffer: joined bytes (1-byte separators) never
    // exceed the source span they came from, which never exceeds numBytes
    val buf = new Array[Byte](numBytes)
    val hs = new Array[Long](windows)
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
      hs(w) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
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
