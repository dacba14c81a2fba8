package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (greedy longest-match-first, the
  * BERT/HuggingFace `WordpieceTokenizer` semantics) over the
  * whitespace words of a string — the third tokenizer dialect next to
  * [[BpeApply]] (merge-rank BPE) and `TextFunctions.unigramTokens`
  * (unigram-LM Viterbi).
  *
  * Per word: from the current position, try the LONGEST substring
  * first and shrink until a vocab piece matches — pieces at position
  * > 0 must carry the `##` continuation prefix in the vocab; emit and
  * advance. If no piece matches at some position, or the word exceeds
  * `maxWordChars` code points, the ENTIRE word becomes `unk` (partial
  * pieces are discarded — HF semantics, not a per-position fallback).
  * Matching is code-point-based (surrogate-safe, the trainBpeMerges
  * convention).
  *
  * The vocab rides the expression as a reference object (a HashSet
  * serialized once per task binary, not per row) and the kernel call
  * is generated inline, so the expression stays inside whole-stage
  * codegen. Cost per word is O(len²) substring probes worst-case
  * (len ≤ maxWordChars bounds it); vocab-sized tables are
  * broadcast-sized by contract (model artifacts).
  */
case class WordPieceApply(child: Expression, vocab: Seq[String],
                          unk: String, maxWordChars: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_apply"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  @transient private lazy val kernel = new WordPieceKernel(vocab, unk, maxWordChars)

  protected override def nullSafeEval(input: Any): Any =
    kernel.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpKernel", kernel, classOf[WordPieceKernel].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokenize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-task WordPiece kernel: vocab hash-set + greedy longest-match
  * scan. Serializable so the codegen reference object ships with the
  * task binary. */
class WordPieceKernel(vocab: Seq[String], unk: String, maxWordChars: Int)
    extends Serializable {
  require(maxWordChars >= 1, s"maxWordChars $maxWordChars must be >= 1")

  @transient private lazy val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, vocab.size * 2))
    vocab.foreach(s.add)
    s
  }

  /** Longest piece length worth probing (in code points, prefix
    * stripped for continuation pieces) — caps the inner shrink loop. */
  @transient private lazy val maxPieceCp: Int = {
    var m = 1
    vocab.foreach { p =>
      val raw = if (p.startsWith("##")) p.substring(2) else p
      m = math.max(m, raw.codePointCount(0, raw.length))
    }
    m
  }

  /** Tokenize one word into pieces, or null to signal whole-word UNK. */
  private def wpWord(word: String): Array[String] = {
    // code-point index -> char offset map so substring probes are
    // surrogate-safe without materializing a per-cp string array
    val nCp = word.codePointCount(0, word.length)
    if (nCp > maxWordChars) return null
    val cpOff = new Array[Int](nCp + 1)
    var ci = 0
    var cp = 0
    while (cp < nCp) {
      cpOff(cp) = ci
      ci += Character.charCount(word.codePointAt(ci))
      cp += 1
    }
    cpOff(nCp) = word.length
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = 0
    while (pos < nCp) {
      var end = math.min(nCp, pos + maxPieceCp)
      var hit: String = null
      while (hit == null && end > pos) {
        val cand0 = word.substring(cpOff(pos), cpOff(end))
        val cand = if (pos > 0) "##" + cand0 else cand0
        if (pieces.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) return null
      out += hit
      pos = end
    }
    out.toArray
  }

  def tokenize(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    for (word <- s.toString.split("\\s+") if word.nonEmpty) {
      val toks = wpWord(word)
      if (toks == null) out += UTF8String.fromString(unk)
      else for (t <- toks) out += UTF8String.fromString(t)
    }
    new GenericArrayData(out.toArray)
  }
}
