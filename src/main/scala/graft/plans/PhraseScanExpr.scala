package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring scan via an Aho-Corasick automaton
  * (Aho & Corasick 1975) — the blocklist/PII-phrase primitive: ONE
  * pass over the text finds every occurrence of every pattern,
  * replacing the P chained `contains`/regex passes a naive blocklist
  * costs (the text is read once regardless of pattern count).
  * Substring semantics, not word-boundary — "qu" matches inside
  * "query", and patterns may span whitespace ("fast filter").
  *
  * [[PhraseHits]] returns the TOTAL match count — every (position,
  * pattern) occurrence, overlaps included (the density signal a
  * blocklist thresholds on). [[PhraseMatches]] returns the DISTINCT
  * matched patterns, sorted (the audit signal: which rules fired).
  * Both ride the same per-task automaton (a reference object
  * serialized once per task binary) and stay inside whole-stage
  * codegen.
  *
  * Matching is over UTF-16 code units internally, but occurrence
  * COUNTS and match SETS are unit-basis-independent (a pattern
  * occurrence exists at a code-point position iff it exists at the
  * corresponding UTF-16 offset), so results agree with code-point
  * engines. Patterns are a broadcast-sized model artifact by
  * contract. */
case class PhraseHits(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phrase_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  @transient private lazy val kernel = new AhoCorasickKernel(patterns)

  protected override def nullSafeEval(input: Any): Any =
    kernel.countHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acKernel", kernel, classOf[AhoCorasickKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countHits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct matched patterns, sorted — see [[PhraseHits]]. */
case class PhraseMatches(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phrase_matches"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  @transient private lazy val kernel = new AhoCorasickKernel(patterns)

  protected override def nullSafeEval(input: Any): Any =
    kernel.matchedSorted(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acKernel", kernel, classOf[AhoCorasickKernel].getName)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.matchedSorted($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-task Aho-Corasick automaton: trie + BFS failure links +
  * per-node output counts. Serializable so the codegen reference
  * object ships with the task binary; the automaton itself is
  * rebuilt lazily per deserialization (only the pattern list
  * serializes). */
class AhoCorasickKernel(patterns: Seq[String]) extends Serializable {
  require(patterns.forall(_.nonEmpty), "empty pattern not allowed")

  // trie as growable parallel arrays; goto maps are per-node HashMaps
  // (pattern alphabets are tiny vs Char range — dense tables would
  // waste 128KB/node)
  @transient private lazy val automaton: (Array[java.util.HashMap[Character, Integer]],
      Array[Int], Array[Int], Array[Array[Int]]) = {
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outPat = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        val nxt = goto(s).get(ch)
        if (nxt != null) s = nxt
        else {
          goto += new java.util.HashMap[Character, Integer]()
          outPat += Array.empty[Int]
          goto(s).put(ch, goto.size - 1)
          s = goto.size - 1
        }
      }
      outPat(s) = outPat(s) :+ pi
    }
    val n = goto.size
    val fail = new Array[Int](n)
    // outCount/outPats fold failure-chain outputs in at build time so
    // the scan never walks fail chains per position
    val queue = new java.util.ArrayDeque[Integer]()
    goto(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      outPat(u) = outPat(u) ++ outPat(fail(u))
      goto(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && !goto(f).containsKey(ch)) f = fail(f)
        val t = goto(f).get(ch)
        fail(v) = if (t != null && t != v) t.intValue() else 0
        queue.add(v)
      }
    }
    (goto.toArray, fail, outPat.map(_.length).toArray, outPat.toArray)
  }

  private def step(s0: Int, ch: Char): Int = {
    val (goto, fail, _, _) = automaton
    var s = s0
    var nxt = goto(s).get(ch)
    while (nxt == null && s != 0) { s = fail(s); nxt = goto(s).get(ch) }
    if (nxt == null) 0 else nxt.intValue()
  }

  /** Total (position, pattern) occurrences, overlaps included. */
  def countHits(text: UTF8String): Long = {
    val (_, _, outCount, _) = automaton
    val s = text.toString
    var state = 0
    var hits = 0L
    var i = 0
    while (i < s.length) {
      state = step(state, s.charAt(i))
      hits += outCount(state)
      i += 1
    }
    hits
  }

  /** Distinct matched patterns, sorted ascending. */
  def matchedSorted(text: UTF8String): ArrayData = {
    val (_, _, _, outPats) = automaton
    val s = text.toString
    val seen = new Array[Boolean](patterns.size)
    var state = 0
    var i = 0
    while (i < s.length) {
      state = step(state, s.charAt(i))
      val ps = outPats(state)
      var j = 0
      while (j < ps.length) { seen(ps(j)) = true; j += 1 }
      i += 1
    }
    // Sort in UTF8String (UTF-8 byte / code-point) order, NOT Java
    // String order: UTF-16 code-unit order diverges for pattern sets
    // mixing U+E000..U+FFFF with supplementary-plane characters, and
    // both Spark string sort and DuckDB list_sort are byte-ordered.
    val hit = patterns.zipWithIndex.collect {
      case (p, pi) if seen(pi) => UTF8String.fromString(p)
    }.sortWith(_.compareTo(_) < 0)
    new GenericArrayData(hit.toArray[Any])
  }
}
