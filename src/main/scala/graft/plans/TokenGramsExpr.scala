package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-position (NON-deduplicated) word n-grams of a token ARRAY —
  * the frequency-preserving sibling of [[TokenShingles]] and the fused
  * form of
  * `transform(sequence(1, greatest(size(toks) - (n-1), 1)),
  *   i => concat_ws(" ", slice(toks, i, n)))`.
  *
  * Why a kernel (r15 optimization round): the HOF form is interpreted
  * (CodegenFallback) and re-evaluates its captured child EXPRESSIONS
  * per element — every call site passes a COMPUTED `toks`
  * (`filter(split(text, "\\s+"), …)`), so the document re-tokenizes
  * once per gram position, O(len²) bytes per doc (the r13 winnowSet /
  * TokenShingles mechanism; measured 10 s each on q_top_ngram /
  * q_top_ngrams at sf0.1). Here the token array is a normal unary
  * child — evaluated ONCE per row — and the window join is one pass
  * over its elements.
  *
  * Bit-compat contract (spec-asserted, array equality vs the HOF
  * form):
  *  - 0 tokens → [""] (concat_ws over the empty slice of the one
  *    forced sequence element);
  *  - fewer than n tokens → ONE gram of all tokens (slice truncation);
  *  - else size − n + 1 grams, each the window's tokens joined by a
  *    single 0x20 (exactly `concat_ws(" ", …)`);
  *  - null ELEMENTS are skipped without a separator (concat_ws
  *    semantics);
  *  - `step` (default 1) generalizes the walk to strided chunking —
  *    the fused form of `chunkTokens`'s
  *    `transform(sequence(1, greatest(size(toks) - (n - step), 1), step),
  *      i => concat_ws(" ", slice(toks, i, n)))`
  *    (step = chunkSize − overlap; step 1 ⟺ the n-gram bound since
  *    n − 1 = the gram overlap).
  */
case class TokenGrams(child: Expression, n: Int, step: Int = 1)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && step >= 1 && step <= n =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1 and 1 <= step <= n, got n=$n step=$step")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<string> input, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TokenGrams.grams(input.asInstanceOf[ArrayData], n, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenGrams.grams($c, $n, $step)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenGrams {

  private val SPACE = UTF8String.fromString(" ")

  /** Tight-loop kernel; also called from generated code. */
  def grams(toks: ArrayData, n: Int, step: Int = 1): ArrayData = {
    val numToks = toks.numElements()
    if (numToks == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val elems = new Array[UTF8String](numToks)
    var i = 0
    while (i < numToks) {
      // null elements stay null here; the join below skips them the
      // way concat_ws does (no separator emitted for a null)
      if (!toks.isNullAt(i)) elems(i) = toks.getUTF8String(i)
      i += 1
    }
    // last valid 1-based start = max(numToks - (n - step), 1); window
    // count = the strided sequence's length
    val upper = math.max(numToks - (n - step), 1)
    val windows = (upper - 1) / step + 1
    val out = new Array[Any](windows)
    var j = 0
    while (j < windows) {
      val w = j * step
      val end = math.min(w + n, numToks)
      // count the non-null window members to size the concat
      var parts = 0
      var k = w
      while (k < end) { if (elems(k) ne null) parts += 1; k += 1 }
      if (parts == 0) out(j) = UTF8String.EMPTY_UTF8
      else {
        val arr = new Array[UTF8String](2 * parts - 1)
        var m = 0
        k = w
        while (k < end) {
          if (elems(k) ne null) {
            if (m > 0) { arr(m) = SPACE; m += 1 }
            arr(m) = elems(k); m += 1
          }
          k += 1
        }
        out(j) = UTF8String.concat(arr: _*)
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
