package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string's UTF-8 bytes —
  * `compressed_len / raw_len` — the published cheap repetitiveness
  * signal (Dolma and RedPajama-v2 ship a gzip/zlib document ratio;
  * boilerplate and templated spam compress far below prose, and
  * high-entropy noise sits near or above 1.0). Determinism: a fixed
  * Deflater level with no gzip header/timestamp makes the value a
  * pure function of the bytes WITHIN one zlib build (spec-asserted
  * same-JVM); deflate output is NOT pinned across zlib/JDK versions,
  * so on a heterogeneous cluster or across JDK upgrades treat the
  * ratio as a heuristic feature, not a reproducible key — don't use
  * it where the md5/xxhash draws' cross-run contract is needed. NOT
  * SQL-expressible (no oracle engine exposes deflate) — spec-only by
  * declared design, like the streaming ops.
  *
  * Per-row imperative work (a Deflater round), so it is a codegen
  * expression calling a static kernel — a Scala UDF would box and cut
  * the whole-stage span. Empty strings report 1.0 (nothing to
  * compress, not "infinitely compressible"). Cost is O(bytes) per
  * row with a thread-local Deflater (allocation-free steady state).
  */
case class CompressionRatio(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "compression_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    CompressionRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CompressionRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionRatio {

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      // BEST_SPEED: the signal needs relative ordering, not maximal
      // compression; nowrap = raw deflate (no zlib header bytes
      // inflating tiny docs)
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
  }

  /** Kernel; also called from generated code. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](256)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }
}
