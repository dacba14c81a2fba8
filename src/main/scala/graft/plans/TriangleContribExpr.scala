package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-edge triangle contributions via sorted-neighbor intersection —
  * the edge-iterator triangle kernel behind
  * [[graft.functions.Corpus.triangleCounts]]: for an oriented edge
  * (f, t) with SORTED, DUPLICATE-FREE out-neighbor arrays `nf` and
  * `nt`, every w ∈ nf ∩ nt closes exactly one triangle {f, t, w}
  * (unique by the acyclic orientation: the triangle's apex sees both
  * other corners, and only the apex→middle edge finds the third).
  *
  * Returns the flat contribution array `[w₁…w_k, f×k, t×k]` — one
  * element per (+1 to that node's triangle count) — in a SINGLE
  * sorted-merge pass, so the caller can `explode` it inline without
  * the multi-eval hazard of composing `array_intersect` + `size` +
  * `array_repeat` (CollapseProject would re-evaluate the intersection
  * three times per row). The merge is O(|nf| + |nt|) with zero
  * hashing; output size is exactly 3 × (triangles closed at this
  * edge), so downstream rows are proportional to REAL triangles, not
  * wedges — the whole point of replacing the wedge self-join, whose
  * Σ outdeg² candidate rows all materialize and (above the broadcast
  * cap) all shuffle.
  *
  * Arrays must be sorted by Spark's order for the element type
  * (`sort_array`) and duplicate-free (oriented edge lists are sets);
  * both hold by construction in the one caller. Element type is
  * STRING or LONG (r15: the long-keyed canonical path halves shuffle
  * bytes and compares 8-byte words — integral co-purchase graphs);
  * output element type mirrors the endpoints. */
case class TriangleContrib(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType =
    ArrayType(third.dataType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "triangle_contrib"

  override def checkInputDataTypes(): TypeCheckResult = {
    val et = third.dataType
    def arrOk(dt: DataType): Boolean = dt match {
      case ArrayType(t, _) if t == et => true
      case _ => false
    }
    if (et != StringType && et != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName endpoints must be string or bigint, got " +
          s"${et.catalogString}")
    else if (fourth.dataType != et)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName endpoint types differ: ${et.catalogString} vs " +
          s"${fourth.dataType.catalogString}")
    else if (!arrOk(first.dataType) || !arrOk(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<${et.catalogString}> neighbor " +
          s"lists, got ${first.dataType.catalogString}, " +
          s"${second.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected override def nullSafeEval(nf: Any, nt: Any, f: Any, t: Any): Any =
    if (third.dataType == LongType)
      TriangleContrib.contribLong(nf.asInstanceOf[ArrayData],
        nt.asInstanceOf[ArrayData], f.asInstanceOf[Long], t.asInstanceOf[Long])
    else
      TriangleContrib.contrib(nf.asInstanceOf[ArrayData],
        nt.asInstanceOf[ArrayData], f.asInstanceOf[UTF8String],
        t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (third.dataType == LongType)
      defineCodeGen(ctx, ev, (nf, nt, f, t) =>
        s"graft.plans.TriangleContrib.contribLong($nf, $nt, $f, $t)")
    else
      defineCodeGen(ctx, ev, (nf, nt, f, t) =>
        s"graft.plans.TriangleContrib.contrib($nf, $nt, $f, $t)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object TriangleContrib {

  private val empty = new GenericArrayData(Array.empty[Any])

  /** Kernel; also called from generated code. */
  def contrib(nf: ArrayData, nt: ArrayData, f: UTF8String,
              t: UTF8String): ArrayData = {
    val n1 = nf.numElements()
    val n2 = nt.numElements()
    var i = 0
    var j = 0
    var k = 0
    // pass 1: count the intersection (no allocation unless nonempty)
    while (i < n1 && j < n2) {
      val c = nf.getUTF8String(i).compareTo(nt.getUTF8String(j))
      if (c == 0) { k += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    if (k == 0) return empty
    val out = new Array[Any](3 * k)
    i = 0; j = 0
    var x = 0
    while (x < k) {
      val a = nf.getUTF8String(i)
      val c = a.compareTo(nt.getUTF8String(j))
      if (c == 0) {
        out(x) = a
        out(k + x) = f
        out(2 * k + x) = t
        x += 1; i += 1; j += 1
      }
      else if (c < 0) i += 1
      else j += 1
    }
    new GenericArrayData(out)
  }

  /** Long-keyed twin of [[contrib]] — 8-byte compares, no UTF-8
    * byte-wise comparison in the merge loop. */
  def contribLong(nf: ArrayData, nt: ArrayData, f: Long, t: Long): ArrayData = {
    val n1 = nf.numElements()
    val n2 = nt.numElements()
    var i = 0
    var j = 0
    var k = 0
    while (i < n1 && j < n2) {
      val a = nf.getLong(i)
      val b = nt.getLong(j)
      if (a == b) { k += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    if (k == 0) return empty
    val out = new Array[Any](3 * k)
    i = 0; j = 0
    var x = 0
    while (x < k) {
      val a = nf.getLong(i)
      val b = nt.getLong(j)
      if (a == b) {
        out(x) = a
        out(k + x) = f
        out(2 * k + x) = t
        x += 1; i += 1; j += 1
      }
      else if (a < b) i += 1
      else j += 1
    }
    new GenericArrayData(out)
  }
}
