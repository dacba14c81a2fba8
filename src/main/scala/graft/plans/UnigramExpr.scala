package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel state for the unigram-LM (SentencePiece-style)
  * tokenizer family: the piece inventory with log probabilities,
  * indexed for per-position longest-window matching. Rides codegen
  * expressions as a reference object (serialized once per task binary,
  * not per row) — vocabularies are model artifacts, broadcast-sized by
  * contract.
  *
  * Matching is by UTF-16 substring equality, but pieces are built on
  * CODE-POINT boundaries (the trainer guarantees it), so a mid-
  * surrogate word offset can never match any piece and the lattice
  * stays code-point aligned — the same surrogate discipline as
  * [[BpeKernel]]. */
class UnigramVocab(val pieces: Array[String], val logProbs: Array[Double])
    extends Serializable {
  require(pieces.length == logProbs.length, "pieces/logProbs length mismatch")

  @transient lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
    m
  }
  @transient lazy val maxPieceChars: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max

  /** Log-prob charged to an out-of-vocabulary code point at APPLY
    * time (training never needs it — single code points of every
    * training word are protected vocab). Large negative: an OOV char
    * is always its own piece and never outcompetes a real piece. */
  val unkLogProb: Double = -1e9

  private def logsumexp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** Forward-backward expected piece counts for one word — the
    * E-step contribution. Returns (pieceId → expected count) for
    * pieces with nonzero posterior. Empty for the empty word. */
  def expectedCounts(word: String): java.util.HashMap[Integer, java.lang.Double] = {
    val out = new java.util.HashMap[Integer, java.lang.Double]()
    val n = word.length
    if (n == 0) return out
    val la = Array.fill(n + 1)(Double.NegativeInfinity); la(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(i, maxPieceChars)
      while (l <= maxL) {
        val j = i - l
        if (la(j) != Double.NegativeInfinity) {
          val id = index.get(word.substring(j, i))
          if (id != null)
            la(i) = logsumexp(la(i), la(j) + logProbs(id))
        }
        l += 1
      }
      i += 1
    }
    if (la(n) == Double.NegativeInfinity) return out // unsegmentable
    val lb = Array.fill(n + 1)(Double.NegativeInfinity); lb(n) = 0.0
    var j = n - 1
    while (j >= 0) {
      var l = 1
      val maxL = math.min(n - j, maxPieceChars)
      while (l <= maxL) {
        val i2 = j + l
        if (lb(i2) != Double.NegativeInfinity) {
          val id = index.get(word.substring(j, i2))
          if (id != null)
            lb(j) = logsumexp(lb(j), logProbs(id) + lb(i2))
        }
        l += 1
      }
      j -= 1
    }
    j = 0
    while (j < n) {
      if (la(j) != Double.NegativeInfinity) {
        var l = 1
        val maxL = math.min(n - j, maxPieceChars)
        while (l <= maxL) {
          val i2 = j + l
          val id = index.get(word.substring(j, i2))
          if (id != null && lb(i2) != Double.NegativeInfinity) {
            val c = math.exp(la(j) + logProbs(id) + lb(i2) - la(n))
            if (c > 0.0) {
              val prev = out.get(id)
              out.put(id, if (prev == null) c else prev + c)
            }
          }
          l += 1
        }
      }
      j += 1
    }
    out
  }

  /** Viterbi segmentation of one word: max-probability piece
    * sequence. Tie-break: on equal score prefer the LONGER final
    * piece (smaller back-pointer) — deterministic and
    * compression-biased, matched by the spec's driver simulation.
    * An out-of-vocabulary code point becomes its own piece at
    * [[unkLogProb]], so apply never fails on unseen text. */
  def viterbi(word: String): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val dp = Array.fill(n + 1)(Double.NegativeInfinity); dp(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    var i = 1
    while (i <= n) {
      // a boundary between the halves of a surrogate pair is not a
      // code-point boundary: admit NO lattice node there — neither the
      // OOV fallback nor a vocab match (an arbitrary table-loaded
      // vocab may contain surrogate-half pieces; a node here would
      // let the winning path split the pair, violating the class
      // invariant that output pieces are code-point aligned)
      val midPair = i < n && Character.isHighSurrogate(word.charAt(i - 1)) &&
        Character.isLowSurrogate(word.charAt(i))
      if (!midPair) {
        var l = 1
        val maxL = math.min(i, maxPieceChars)
        while (l <= maxL) {
          val j = i - l
          if (dp(j) != Double.NegativeInfinity) {
            val id = index.get(word.substring(j, i))
            if (id != null) {
              val s = dp(j) + logProbs(id)
              // strictly-greater OR equal-score-with-smaller-j: the
              // LONGER final piece wins ties — deterministic and
              // compression-biased (l ascends so j descends; the
              // explicit j < back(i) check makes the rule independent
              // of iteration order)
              if (s > dp(i) || (s == dp(i) && back(i) >= 0 && j < back(i))) {
                dp(i) = s; back(i) = j
              }
            }
          }
          l += 1
        }
        // OOV fallback: one code point (a lone surrogate half counts
        // as its own code point, same as String.codePointAt) as its
        // own piece, when no real piece ends here from a reachable
        // state.
        if (back(i) == -1) {
          val cpLen =
            if (i >= 2 && Character.isSurrogatePair(word.charAt(i - 2), word.charAt(i - 1))) 2
            else 1
          val j = i - cpLen
          if (j >= 0 && dp(j) != Double.NegativeInfinity) {
            dp(i) = dp(j) + unkLogProb
            back(i) = j
          }
        }
      }
      i += 1
    }
    if (back(n) == -1) return Array(word) // defensive; unreachable
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var e = n
    while (e > 0) { val s = back(e); parts += word.substring(s, e); e = s }
    parts.reverseIterator.toArray
  }

  /** Expected counts of one word as rows for the E-step aggregate. */
  def expectedRows(s: UTF8String): ArrayData = {
    val m = expectedCounts(s.toString)
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.intValue(), e.getValue.doubleValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Whitespace-split then per-word Viterbi — the apply surface. */
  def tokenize(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    for (word <- s.toString.split("\\s+") if word.nonEmpty)
      for (t <- viterbi(word)) out += UTF8String.fromString(t)
    new GenericArrayData(out.toArray)
  }
}

/** E-step expression: per word, array<struct<i, c>> of expected piece
  * counts under the vocabulary's current probabilities. */
case class UnigramExpected(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("i", IntegerType, nullable = false),
      StructField("c", DoubleType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_expected"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    vocab.expectedRows(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, classOf[UnigramVocab].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.expectedRows($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Apply expression: whitespace words → Viterbi subword pieces. */
case class UnigramTokens(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    vocab.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, classOf[UnigramVocab].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokenize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
