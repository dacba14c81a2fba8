package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregation surface — the reference's Combine family.
  *
  * The reference's 4-function combiner contract — init / reduce / merge /
  * extract (`combine-fn` datasplash core.clj:716-774, Java
  * ClojureCombineFn.java:11-66) — is exactly Spark's
  * `Aggregator[IN, BUF, OUT]` (zero/reduce/merge/finish). Catalyst always
  * executes it as partial (map-side) + final aggregation, so the
  * reference's manual `:fanout` hot-key option (core.clj:1866-1868) is
  * unnecessary; AQE handles residual skew.
  *
  * Built-in combiners mirror core.clj:1982-2080 (`count-fn` `sum-fn`
  * `mean-fn` `max-fn` `min-fn` `frequencies-fn`) in both typed
  * (Aggregator) and columnar (Column expression — preferred, codegen'd)
  * forms. `juxt` (core.clj:864-897) = multi-aggregate in one pass, which
  * Spark does natively (`agg(a1, a2, …)`).
  */
object Combiners {

  /** Build an Aggregator from the reference's 4-fn contract
    * (core.clj:716-774). */
  def combineFn[IN, BUF, OUT](
      z: => BUF,
      red: (BUF, IN) => BUF,
      mrg: (BUF, BUF) => BUF,
      fin: BUF => OUT)(implicit be: Encoder[BUF], oe: Encoder[OUT]): Aggregator[IN, BUF, OUT] =
    new Aggregator[IN, BUF, OUT] {
      override def zero: BUF = z
      override def reduce(b: BUF, a: IN): BUF = red(b, a)
      override def merge(a: BUF, b: BUF): BUF = mrg(a, b)
      override def finish(b: BUF): OUT = fin(b)
      override def bufferEncoder: Encoder[BUF] = be
      override def outputEncoder: Encoder[OUT] = oe
    }

  /** Reference sugar: a bare associative fn (e.g. `+`) is a combiner
    * (core.clj:855-862 `->combine-fn`). */
  def reduceFn[T](op: (T, T) => T, z: => T)(implicit e: Encoder[T]): Aggregator[T, T, T] =
    combineFn[T, T, T](z, op, op, identity)(e, e)

  // ---------------- typed built-ins (Aggregator forms) ----------------

  /** `count-fn` (core.clj:1982-1990) with optional predicate/mapper
    * (weighted count). */
  def countFn[IN](pred: IN => Boolean = (_: IN) => true,
                  mapper: IN => Long = (_: IN) => 1L): Aggregator[IN, Long, Long] =
    combineFn[IN, Long, Long](0L, (b, a) => if (pred(a)) b + mapper(a) else b, _ + _, identity)(
      Encoders.scalaLong, Encoders.scalaLong)

  /** `sum-fn` (core.clj:1992-2002). */
  def sumFn[IN](f: IN => Double, pred: IN => Boolean = (_: IN) => true): Aggregator[IN, Double, Double] =
    combineFn[IN, Double, Double](0.0, (b, a) => if (pred(a)) b + f(a) else b, _ + _, identity)(
      Encoders.scalaDouble, Encoders.scalaDouble)

  /** `mean-fn` (core.clj:2004-2017): (sum, count) buffer, 0.0 on empty. */
  def meanFn[IN](f: IN => Double): Aggregator[IN, (Double, Long), Double] =
    combineFn[IN, (Double, Long), Double](
      (0.0, 0L),
      (b, a) => (b._1 + f(a), b._2 + 1),
      (a, b) => (a._1 + b._1, a._2 + b._2),
      b => if (b._2 == 0) 0.0 else b._1 / b._2)(
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong), Encoders.scalaDouble)

  /** `max-fn` / `min-fn` (core.clj:2019-2050), nil-safe on empty input. */
  def maxFn[IN](f: IN => Double): Aggregator[IN, Option[Double], Option[Double]] =
    extremumFn(f, math.max)

  def minFn[IN](f: IN => Double): Aggregator[IN, Option[Double], Option[Double]] =
    extremumFn(f, math.min)

  private def extremumFn[IN](f: IN => Double, pick: (Double, Double) => Double)
      : Aggregator[IN, Option[Double], Option[Double]] = {
    implicit val optEnc: Encoder[Option[Double]] = ExtraEncoders.optionDouble
    combineFn[IN, Option[Double], Option[Double]](
      Option.empty[Double],
      (b, a) => Some(b.fold(f(a))(pick(_, f(a)))),
      (a, b) => (a, b) match {
        case (Some(x), Some(y)) => Some(pick(x, y))
        case (x, y)             => x.orElse(y)
      },
      identity)
  }

  /** Bounded top-k combiner: the accumulator never exceeds k elements,
    * so partial (map-side) aggregation ships only k candidates per
    * partition to the shuffle — the scalable alternative to
    * row_number-over-window when groups are huge and k is small.
    * Returns the top k projections in descending order. */
  def topKFn[IN, B](k: Int, proj: IN => B)(
      implicit ord: Ordering[B], be: Encoder[Seq[B]]): Aggregator[IN, Seq[B], Seq[B]] =
    combineFn[IN, Seq[B], Seq[B]](
      Seq.empty[B],
      (buf, x) => (buf :+ proj(x)).sorted(ord.reverse).take(k),
      (a, b) => (a ++ b).sorted(ord.reverse).take(k),
      identity)(be, be)

  /** Columnar top-k rows per key (windowed rank — sorts within groups;
    * prefer [[topKFn]] when groups are huge and only k values are
    * needed). */
  def topKPerKey(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                 order: Seq[Column], k: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k).drop("__rk")
  }

  /** `frequencies-fn` (core.clj:2052-2063): value→count map as one
    * accumulator. At scale prefer the columnar `frequencies` (a groupBy),
    * which shuffles counts, not maps. */
  def frequenciesFn[IN, K](f: IN => K)(implicit me: Encoder[Map[K, Long]]): Aggregator[IN, Map[K, Long], Map[K, Long]] =
    combineFn[IN, Map[K, Long], Map[K, Long]](
      Map.empty[K, Long],
      (b, a) => { val k = f(a); b.updated(k, b.getOrElse(k, 0L) + 1L) },
      (a, b) => b.foldLeft(a) { case (m, (k, n)) => m.updated(k, m.getOrElse(k, 0L) + n) },
      identity)(me, me)

  // ---------------- columnar built-ins (preferred at scale) -----------

  /** Weighted / predicated count, columnar (core.clj:1982-1990). */
  def countIf(pred: Column): Column = count_if(pred)

  def weightedCount(pred: Column, weight: Column): Column =
    coalesce(sum(when(pred, weight)), lit(0L))

  /** Predicated sum, columnar (core.clj:1992-2002). */
  def sumIf(e: Column, pred: Column): Column = sum(when(pred, e))

  /** `juxt` (core.clj:864-897): N combiners in one pass — native in
    * Spark: just pass them all to one `agg`. */
  def juxt(df: org.apache.spark.sql.DataFrame, aggs: Column*): org.apache.spark.sql.DataFrame =
    df.agg(aggs.head, aggs.tail: _*)

  /** `combine-by` (core.clj:1915-1946): with-keys + combine :per-key
    * composed = groupBy(expr).agg(...). */
  def combineBy(df: org.apache.spark.sql.DataFrame, keyExpr: Column, aggs: Column*): org.apache.spark.sql.DataFrame =
    df.groupBy(keyExpr).agg(aggs.head, aggs.tail: _*)

  /** `frequencies` (core.clj:2065-2080, Beam Count.perElement). */
  def frequencies(df: org.apache.spark.sql.DataFrame, e: Column, as: String = "value"): org.apache.spark.sql.DataFrame =
    df.groupBy(e.as(as)).agg(count(lit(1)).as("count"))
}

/** Encoders Spark's implicits don't cover directly. */
object ExtraEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val optionDouble: Encoder[Option[Double]] = ExpressionEncoder[Option[Double]]()
}
