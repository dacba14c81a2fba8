package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multiset twin of [[ShingleHashes]]: (xxhash64, occurrence count)
  * per DISTINCT character n-gram of a string, one pass, no substring
  * materialization — the fused form of
  * `explode(charTrigrams(text)) |> groupBy(xxhash64(tri)) count`
  * collapsed to a per-row kernel. Output is ascending by hash;
  * Σ counts = max(numChars - n + 1, 1) (the [[ShingleHashes]] window
  * rule — a short string contributes its single short window, an
  * empty string the empty window).
  *
  * Built for multinomial models over char n-grams
  * (`TextFunctions.langIdNgram`): the per-occurrence explode was the
  * top cost of the naive shape (O(len²) character-seek substrings +
  * a corpus × occurrences string shuffle); this kernel emits one
  * 12-byte struct per distinct shingle and downstream joins run on
  * the 8-byte hash. Hashes are bit-identical to
  * `xxhash64(substring)` (seed 42), so a profile table keyed by
  * `xxhash64(tri)` joins exactly.
  */
case class ShingleHashCounts(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("c", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashCounts.hashCounts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHashCounts.hashCounts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashCounts {

  /** Tight-loop kernel; also called from generated code. */
  def hashCounts(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
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

    val windows = math.max(numChars - n + 1, 1)
    val hs = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val from = starts(math.min(w, numChars))
      val to = starts(math.min(w + n, numChars))
      hs(w) = XXH64.hashUnsafeBytes(base, offset + from, to - from, 42L)
      w += 1
    }
    // sort + run-length encode into (hash, count) structs
    java.util.Arrays.sort(hs)
    var distinct = 1
    i = 1
    while (i < windows) {
      if (hs(i) != hs(i - 1)) distinct += 1
      i += 1
    }
    val out = new Array[Any](distinct)
    var d = 0
    var runStart = 0
    i = 1
    while (i <= windows) {
      if (i == windows || hs(i) != hs(runStart)) {
        out(d) = InternalRow(hs(runStart), i - runStart)
        d += 1
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
