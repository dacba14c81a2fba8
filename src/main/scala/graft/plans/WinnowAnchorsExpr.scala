package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing anchor sites (Schleimer et al. 2003) in ONE pass — the
  * kernel behind [[graft.functions.Dedup.duplicateSpanPairs]]'s
  * discovery stage. Emits the distinct `(hash, pos)` minima (1-based
  * code-point `pos`, struct-ordered min per `w`-site window over the
  * `k`-gram hash sequence) — exactly the value the columnar
  * `array_distinct(transform(.., s => array_min(slice(sites, s, w))))`
  * form computes, but O(len) amortized via a monotone deque instead of
  * O(len·w) slice/compare, and with the gram hashed in place over the
  * UTF-8 buffer instead of one substring Column object per site
  * (the md5 oracle tier paid a hex-string `conv` chain per gram on
  * top). Docs with fewer than `w` sites emit no anchors — the
  * windowing precondition, identical to the columnar `when` guard.
  *
  * `md5Tier = false`: XXH64 over the gram's UTF-8 bytes, seed 42 —
  * bit-equal to `xxhash64(substring(...))` (the ShingleHashes
  * precedent, spec-asserted). `md5Tier = true`: the top 60 bits of the
  * MD5 digest — bit-equal to
  * `conv(substring(md5(gram), 1, 15), 16, 10)::long` (15 hex nibbles =
  * digest bytes 0..7 big-endian, logically shifted right 4).
  */
case class WinnowAnchors(child: Expression, k: Int, w: Int, md5Tier: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("p", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_anchors"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs k >= 1, got $k")
    else if (w < 2) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs w >= 2, got $w")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    WinnowAnchors.anchors(input.asInstanceOf[UTF8String], k, w, md5Tier)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowAnchors.anchors($c, $k, $w, $md5Tier)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowAnchors {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Tight-loop kernel; also called from generated code. */
  def anchors(s: UTF8String, k: Int, w: Int, md5Tier: Boolean): ArrayData = {
    val bytes = s.getBytes
    val numBytes = bytes.length
    // code-point start offsets (+ sentinel) — the UTF8String character
    // walk, so positions match Spark's substr character positions
    var numChars = 0
    var i = 0
    while (i < numBytes) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      numChars += 1
    }
    val nSites = numChars - k + 1
    if (nSites < w) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](numChars + 1)
    i = 0
    var c = 0
    while (i < numBytes) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(numChars) = numBytes

    val md = if (md5Tier) md5Local.get() else null
    val hs = new Array[Long](nSites)
    var p = 0
    while (p < nSites) {
      val from = starts(p)
      val len = starts(p + k) - from
      hs(p) =
        if (md5Tier) {
          md.reset()
          md.update(bytes, from, len)
          val d = md.digest()
          // first 15 hex nibbles = bytes 0..7 big-endian >>> 4
          (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        } else XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, len, 42L)
      p += 1
    }

    // monotone deque sliding-window minimum over struct(h, p) order;
    // ties on h keep the EARLIER site (array_min's struct ordering),
    // which the strict `>` pop preserves for free since p ascends
    val deque = new Array[Int](nSites)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Any](nSites - w + 1)
    var m = 0
    var lastIdx = -1
    p = 0
    while (p < nSites) {
      while (tail > head && hs(deque(tail - 1)) > hs(p)) tail -= 1
      deque(tail) = p
      tail += 1
      if (deque(head) <= p - w) head += 1
      if (p >= w - 1) {
        val minIdx = deque(head)
        // window minima repeat in consecutive runs, so last-emitted
        // dedup equals the columnar array_distinct
        if (minIdx != lastIdx) {
          out(m) = new GenericInternalRow(
            Array[Any](hs(minIdx), minIdx + 1)): InternalRow
          m += 1
          lastIdx = minIdx
        }
      }
      p += 1
    }
    new GenericArrayData(
      if (m == out.length) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m)
        .asInstanceOf[Array[Any]])
  }
}
