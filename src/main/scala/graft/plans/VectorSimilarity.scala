package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused vector-similarity Catalyst expression with whole-stage
  * codegen.
  *
  * The composable form (`zip_with` + `aggregate`, see
  * graft.functions.Similarity) materializes an intermediate products
  * array per row pair; on an ANN scoring path that's the hot loop. This
  * expression computes dot / cosine in a single pass over the two
  * ArrayData buffers with no allocation — the "custom Expression beats
  * UDF beats everything else" tier for operators Spark's built-ins
  * can't fuse (SURVEY §4 north-star note).
  *
  * metric: "dot" → Σ aᵢbᵢ; "cosine" → Σ aᵢbᵢ / (‖a‖‖b‖) (0.0 when a
  * norm is zero). Accepts array<float> or array<double> on both sides.
  *
  * Null ELEMENTS (legal whenever an input type carries
  * containsNull=true — every parquet-read array does): a null element
  * inside the fused range [0, min(len)) makes the RESULT null,
  * matching SQL list_dot_product / the `aggregate`-based composable
  * form, where any null product nulls the whole fold (r14 advice
  * item: the previous code read getFloat/getDouble unguarded on the
  * null slot — garbage on UnsafeArrayData — so e.g.
  * `dotFused(v, v) > 0` could PASS a null-element vector on the
  * Spark side while the oracle's list_dot_product excluded it). Same
  * fused-detection pattern as [[L2Normalize]]: the check is guarded
  * by each child's codegen-time containsNull constant, so null-free
  * types keep the branch-free loop.
  */
case class VectorSimilarity(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"vector_$metric"
  // a null ELEMENT can null the result even when both array columns
  // themselves are non-nullable — without this, codegen's isNull slot
  // would be the FalseLiteral and the bail assignment wouldn't compile
  override def nullable: Boolean =
    super.nullable || sideContainsNull(left) || sideContainsNull(right)

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  private def sideContainsNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) =>
        if (metric == "dot" || metric == "cosine") TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"unknown metric $metric")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two arrays of float or double, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  private def leftIsFloat: Boolean = elemType(left).contains(FloatType)
  private def rightIsFloat: Boolean = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = leftIsFloat; val rf = rightIsFloat
    val lcn = sideContainsNull(left); val rcn = sideContainsNull(right)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if ((lcn && x.isNullAt(i)) || (rcn && y.isNullAt(i))) return null
      val u = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val v = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += u * v; nx += u * u; ny += v * v; i += 1
    }
    if (metric == "dot") dot
    else {
      val d = math.sqrt(nx) * math.sqrt(ny)
      if (d == 0.0) 0.0 else dot / d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val getL = if (leftIsFloat) "getFloat" else "getDouble"
      val getR = if (rightIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val u = ctx.freshName("u")
      val v = ctx.freshName("v"); val d = ctx.freshName("d")
      val finish =
        if (metric == "dot") s"${ev.value} = $dot;"
        else
          s"""double $d = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
             |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;""".stripMargin
      // containsNull is a codegen-time CONSTANT per side: when both
      // sides are null-free the original branch-free loop is emitted
      // VERBATIM (no dead `ev.isNull = true` either — with
      // non-nullable children that slot is the false literal and the
      // assignment wouldn't compile). A detected null element nulls
      // the whole result (list_dot_product semantics; the L2Normalize
      // fused-detection pattern).
      val lcn = sideContainsNull(left); val rcn = sideContainsNull(right)
      val nullCheck =
        (if (lcn) Seq(s"$x.isNullAt($i)") else Nil) ++
          (if (rcn) Seq(s"$y.isNullAt($i)") else Nil)
      val nullBail = ctx.freshName("hasNullElem")
      if (nullCheck.isEmpty)
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $u = (double) $x.$getL($i);
           |  double $v = (double) $y.$getR($i);
           |  $dot += $u * $v; $nx += $u * $u; $ny += $v * $v;
           |}
           |$finish
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |boolean $nullBail = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (${nullCheck.mkString(" || ")}) {
           |    $nullBail = true; break;
           |  }
           |  double $u = (double) $x.$getL($i);
           |  double $v = (double) $y.$getR($i);
           |  $dot += $u * $v; $nx += $u * $u; $ny += $v * $v;
           |}
           |if ($nullBail) {
           |  ${ev.isNull} = true;
           |} else {
           |  $finish
           |}
         """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass L2 normalization of a float/double vector to
  * array<double>. Replaces the interpreted-HOF form
  * `transform(v, x => x / sqrt(dotFused(v, v)))`, whose CAPTURED child
  * re-evaluates the norm — and any computed child `v` — once per
  * element, O(d²) per row (the r13 wave-3 hazard, caught in review at
  * the q_ann_pq/q_ann_recall normalization sites). Bit-equal to that
  * form by construction: the same index-order sum-of-squares
  * accumulation, one sqrt, the same per-element division
  * (spec-asserted bit-equal in SimilaritySpec). One DELIBERATE
  * difference: a zero vector yields IEEE 0/0 = NaN elements, where
  * the HOF form under ANSI mode THROWS (Divide's divideByZeroError
  * fires even for doubles) — normalization of a degenerate vector
  * should degrade, not kill the job (spec-asserted). Null ELEMENTS
  * (legal whenever the input type carries containsNull=true, which
  * every parquet-read array does): a null element contributes 0 to
  * the sum of squares and propagates as a null output element —
  * dataType mirrors the child's containsNull, and the null-aware
  * loop only runs when the child's type admits nulls, so the
  * null-free hot path is untouched (r14 advice item: the previous
  * code read getFloat/getDouble unguarded, yielding garbage on
  * UnsafeArrayData / NPE on GenericArrayData). */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = childContainsNull)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array of float or double, got ${t.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    L2Normalize.normalize(input.asInstanceOf[ArrayData], isFloat,
      childContainsNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.L2Normalize.normalize($c, $isFloat, $childContainsNull)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2Normalize {
  def normalize(v: ArrayData, isFloat: Boolean,
                mayContainNull: Boolean): ArrayData = {
    val n = v.numElements()
    // null detection FUSED into the accumulation loop (r14 review: a
    // separate pre-scan cost every parquet-read vector — they all
    // carry containsNull=true — an extra O(d) pass on the ANN hot
    // path); mayContainNull is a codegen-time constant, so the
    // null-free type keeps the branch-free loop, and a rare actual
    // null bails to the boxed path before any output is built
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (mayContainNull && v.isNullAt(i))
        return normalizeNullAware(v, isFloat)
      val u = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      ss += u * u; i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val u = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = u / norm; i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // null element => contributes 0 to the norm, null in the output
  private def normalizeNullAware(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val u = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        ss += u * u
      }
      i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val u = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = u / norm
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
