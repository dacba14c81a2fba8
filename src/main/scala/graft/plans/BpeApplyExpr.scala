package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE merge application over the whitespace words of a string —
  * the real-tokenizer seam: token budgets elsewhere in the engine
  * (packTokens / chunkBySentences / packCorpus) count whitespace or
  * BPE-ish proxy tokens; this expression applies an actual trained
  * merges table (supplied as an ordered (left, right) list — see
  * `TextFunctions.bpeMergesFromTable` for loading one from a
  * DataFrame) so budgets can run in true subword units.
  *
  * Algorithm per word (GPT-2 `bpe()` shape): split into Unicode code
  * points, then repeatedly find the lowest-rank adjacent pair present
  * and merge ALL its occurrences left-to-right, until no mergeable
  * pair remains. For a VALID merges table (each side of a rule is a
  * single code point or the product of an earlier rule — true of any
  * table produced by BPE training) this equals applying the rules
  * sequentially in rank order, which is what the DuckDB oracle's
  * replace-chain computes (q_bpe_tokens).
  *
  * The merges table rides the expression as a reference object
  * (serialized once per task binary, not per row) and the kernel call
  * is generated inline — the expression stays inside whole-stage
  * codegen. Cost per word is O(rounds · parts); vocab-sized tables
  * are broadcast-sized by contract (they are model artifacts).
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  @transient private lazy val kernel = new BpeKernel(merges)

  protected override def nullSafeEval(input: Any): Any =
    kernel.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokenize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-task BPE kernel: rank lookup + merge sweep. Serializable so the
  * codegen reference object ships with the task binary. */
class BpeKernel(merges: Seq[(String, String)]) extends Serializable {

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private def codePoints(s: String): Array[String] = {
    val b = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.toArray
  }

  /** Tokenize one word: lowest-rank-first, all occurrences per round. */
  private def bpeWord(word: String): Array[String] = {
    var parts = codePoints(word)
    var continue = parts.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = rank.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (l, r) = merges(bestRank)
        val merged = scala.collection.mutable.ArrayBuffer[String]()
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == l && parts(j + 1) == r) {
            merged += (l + r); j += 2
          } else { merged += parts(j); j += 1 }
        }
        parts = merged.toArray
        if (parts.length < 2) continue = false
      }
    }
    parts
  }

  def tokenize(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    for (word <- s.toString.split("\\s+") if word.nonEmpty)
      for (t <- bpeWord(word)) out += UTF8String.fromString(t)
    new GenericArrayData(out.toArray)
  }
}
