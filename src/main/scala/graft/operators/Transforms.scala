package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Element-wise transform surface — the reference's ParDo family
  * (datasplash core.clj:584-691 `map-op` factory: `dmap` 612-628,
  * `map-kv` 630-645, `dmapcat` 647-659, `dfilter` 661-674, `dkeep`
  * 676-691, `pardo` 602-610, `identity` 424-428, `with-keys` 903-924).
  *
  * Two API levels per operator, per SURVEY §7.1:
  *   - typed (`T => U` closures) for parity with the reference's
  *     arbitrary-fn model, via `Dataset.map/flatMap/filter`;
  *   - columnar (`Column` expressions) — preferred at scale: stays
  *     inside Catalyst (pushdown / pruning / whole-stage codegen).
  */
object Transforms {

  /** Typed operators as extension methods on any Dataset[T]. */
  implicit class TypedOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** 1→1 transform (reference `dmap` core.clj:612-628). */
    def mapElements[U: Encoder](f: T => U): Dataset[U] = ds.map(f)

    /** 1→1 keyed-pair transform (reference `map-kv` core.clj:630-645). */
    def mapKv[K, V](f: T => (K, V))(implicit e: Encoder[(K, V)]): Dataset[(K, V)] =
      ds.map(f)(e)

    /** 1→N flattening transform (reference `dmapcat` core.clj:647-659). */
    def mapcat[U: Encoder](f: T => IterableOnce[U]): Dataset[U] =
      ds.flatMap(x => f(x).iterator)

    /** Keep elements where the predicate holds; output is the original
      * element (reference `dfilter` core.clj:661-674). */
    def filterElements(p: T => Boolean): Dataset[T] = ds.filter(p)

    /** Map then drop nulls/None (reference `dkeep` core.clj:676-691 —
      * note the reference keeps `false`, only nil is dropped; Option
      * encodes that exactly). */
    def keep[U: Encoder](f: T => Option[U]): Dataset[U] =
      ds.flatMap(x => f(x).iterator)

    /** Raw per-partition escape hatch (reference `pardo` core.clj:602-610
      * + `:initialize-fn` setup core.clj:274-277: init once per partition
      * inside `f`'s prologue — a JVM `lazy val` also covers per-executor
      * setup, no `safe-exec` machinery needed in Scala). */
    def pardo[U: Encoder](f: Iterator[T] => Iterator[U]): Dataset[U] =
      ds.mapPartitions(f)

    /** Passthrough (reference `identity` core.clj:424-428). */
    def identityOp: Dataset[T] = ds

    /** Key every element by `f` (reference `with-keys` core.clj:903-924). */
    def withKeys[K](f: T => K)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
      ds.map(x => (f(x), x))(e)
  }

  // ------------------------------------------------------------------
  // Columnar forms (Catalyst-visible; use these on the 100 TB path)
  // ------------------------------------------------------------------

  /** Columnar `map`: projection. */
  def mapExpr(df: DataFrame, cols: Column*): DataFrame = df.select(cols: _*)

  /** Columnar `filter`. */
  def filterExpr(df: DataFrame, pred: Column): DataFrame = df.where(pred)

  /** Columnar `keep`: project one expression, drop resulting nulls
    * (reference `dkeep` semantics, columnar). */
  def keepExpr(df: DataFrame, e: Column, as: String): DataFrame =
    df.select(e.as(as)).where(col(as).isNotNull)

  /** Columnar `mapcat` over an array expression: explode. */
  def mapcatExpr(df: DataFrame, arr: Column, as: String, keepCols: Seq[Column] = Nil): DataFrame =
    df.select(keepCols :+ explode(arr).as(as): _*)

  /** Columnar `with-keys`: append a key column. */
  def withKeyCol(df: DataFrame, key: Column, as: String = "key"): DataFrame =
    df.withColumn(as, key)

  /** `ptransform` / `pt->>` composite transforms (core.clj:937-988):
    * Beam's named-composite machinery dissolves into plain function
    * composition; apply with `df.transform(compose(...))`. */
  def compose(stages: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    stages.reduceLeft(_ andThen _)

  /** `pt-cond->>` (core.clj:975-988): apply the stage only when the
    * build-time condition holds. */
  def composeIf(cond: Boolean, stage: DataFrame => DataFrame): DataFrame => DataFrame =
    if (cond) stage else identity
}
