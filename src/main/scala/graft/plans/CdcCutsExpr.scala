package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking cut positions in ONE rolling pass — the
  * kernel behind [[graft.functions.Dedup.cdcChunks]].
  *
  * Emits the ascending 1-based character positions `p ∈ [window,
  * len-1]` whose `window`-codepoint polynomial hash (`fold (acc·31 +
  * codepoint) mod 1e9+7`, the [[graft.functions.TextFunctions
  * .fingerprint]] polynomial) is ≡ 0 mod `modulus`, plus the document
  * length as the final cut. The rolling update (`(h − c_out·31^{w-1})
  * ·31 + c_in mod M`) computes the identical integer as the direct
  * per-window fold, so a SQL oracle replays cut selection exactly
  * with `list_reduce` — no hash twin needed.
  *
  * Why a kernel and not array lambdas: the columnar form
  * (`transform` codes once, `filter` positions with a windowed
  * `aggregate`) was probed and REJECTED — Catalyst's CollapseProject
  * inlines a single-referenced alias into the consuming lambda, so
  * the O(len) codes array re-evaluated PER POSITION (and per-char
  * `substring` is itself an O(pos) scan): measured ~15 s at sf0.1
  * where this kernel is O(len) per row.
  */
case class CdcCuts(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_cuts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
    else if (window < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs window >= 1, got $window")
    else if (modulus < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs modulus >= 1, got $modulus")
    else TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any =
    CdcCuts.cuts(input.asInstanceOf[UTF8String], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CdcCuts.cuts($c, $window, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCuts {

  private val M = 1000000007L

  /** Tight-loop kernel; also called from generated code. */
  def cuts(s: UTF8String, window: Int, modulus: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    // worst case: every position cuts, plus the final length cut
    val out = new Array[Int](math.max(n - window, 0) + 1)
    var m = 0
    if (n - 1 >= window) {
      var pw = 1L
      var j = 0
      while (j < window - 1) { pw = pw * 31L % M; j += 1 }
      var h = 0L
      j = 0
      while (j < window) { h = (h * 31L + cps(j)) % M; j += 1 }
      var p = window // 1-based end position of the current window
      while (p <= n - 1) {
        if (h % modulus == 0) { out(m) = p; m += 1 }
        if (p < n - 1) {
          h = ((h - cps(p - window) * pw % M) % M + M) % M
          h = (h * 31L + cps(p)) % M
        }
        p += 1
      }
    }
    out(m) = n
    m += 1
    new GenericArrayData(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }
}
