package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouping / joining / co-grouping / set ops — reference §2.3
  * (datasplash core.clj:926-1861).
  *
  * The reference's only join machinery is CoGroupByKey + a per-key
  * cartesian ParDo (`cogroup-by` core.clj:1526-1691, `join-by`
  * core.clj:1693-1739). Here both collapse onto Spark's relational
  * `join`, so Catalyst + AQE pick broadcast / shuffled-hash / sort-merge
  * physically — strategy selection the reference never had.
  */
object Grouping {

  /** One input leg of a cogroup/join.
    *
    * @param required  reference `:type :required` (core.clj:1598-1617):
    *                  groups missing on this side are dropped.
    * @param dropNil   reference `:drop-nil?` (core.clj:1588-1595):
    *                  pre-filter null-keyed rows on this side.
    */
  case class Leg(df: DataFrame, key: String, required: Boolean = false, dropNil: Boolean = false)

  /** `group-by-key` (core.clj:926-935): key → all values, columnar:
    * groupBy + collect_list of the remaining columns. */
  def groupByKey(df: DataFrame, key: String, valuesAs: String = "values"): DataFrame = {
    val valueCols = df.columns.filterNot(_ == key).map(col)
    df.groupBy(col(key)).agg(collect_list(struct(valueCols.toIndexedSeq: _*)).as(valuesAs))
  }

  /** `group-by` (core.clj:990-1020): key by an expression, then group. */
  def groupByExpr(df: DataFrame, keyExpr: Column, keyAs: String = "key", valuesAs: String = "values"): DataFrame =
    groupByKey(df.withColumn(keyAs, keyExpr), keyAs, valuesAs)

  /** N-way relational join — reference `join-by` (core.clj:1693-1739).
    *
    * Join-type derivation from the reference's required/optional flags:
    * we chain null-safe **full_outer** joins on the (renamed) key, add a
    * per-leg presence marker, and filter `required` markers not-null;
    * Catalyst's EliminateOuterJoin then rewrites each full_outer into
    * inner/left/right — i.e. all-required = inner, one required = outer
    * toward it, none = full_outer, exactly core.clj:1710-1727.
    *
    * Null keys do not join (SQL semantics) but null-keyed rows are kept
    * as unmatched rows — matching the reference's "nil-keyed elements
    * emit as their own group" default (core.clj:1618-1632). `joinNil`
    * switches to null-safe equality (`:join-nil?`). Non-key column names
    * must be distinct across legs (reference merges maps via collector;
    * here the collector is any downstream `select`).
    */
  def joinBy(legs: Seq[Leg], outKey: String = "key", joinNil: Boolean = false): DataFrame = {
    require(legs.size >= 2, "joinBy needs at least 2 inputs")
    val marked = legs.zipWithIndex.map { case (l, i) =>
      val keyed = l.df.withColumnRenamed(l.key, s"__k_$i").withColumn(s"__present_$i", lit(true))
      if (l.dropNil) keyed.where(col(s"__k_$i").isNotNull) else keyed
    }
    val first = marked.head.withColumn(outKey, col("__k_0"))
    val joined = marked.tail.zipWithIndex.foldLeft(first) { case (acc, (next, idx)) =>
      val i = idx + 1
      val cond = if (joinNil) acc(outKey) <=> next(s"__k_$i") else acc(outKey) === next(s"__k_$i")
      acc.join(next, cond, "full_outer")
        .withColumn(outKey, coalesce(acc(outKey), next(s"__k_$i")))
    }
    val filtered = legs.zipWithIndex.foldLeft(joined) { case (df, (l, i)) =>
      if (l.required) df.where(col(s"__present_$i").isNotNull) else df
    }
    filtered.drop(legs.indices.flatMap(i => Seq(s"__k_$i", s"__present_$i")): _*)
  }

  /** N-way cogroup — reference `cogroup-by` (core.clj:1526-1691).
    * Output: one row per key, one array-of-struct column per leg (tag),
    * missing sides as empty arrays; `required` legs drop absent keys;
    * null-keyed rows each form their own singleton group unless
    * `joinNil` (core.clj:1618-1632) or dropped per-leg via `dropNil`.
    *
    * Execution: every leg is widened to one nullable struct slot per
    * leg and unioned, so the whole cogroup is ONE shuffle on the key +
    * one aggregate (`collect_list` skips the other legs' null slots) —
    * not N per-leg aggregates chained through full-outer joins, which
    * re-exchange at every join because union breaks partitioning
    * propagation. Cost model: 1 stage at any arity, but each shuffled
    * row carries one fixed-width slot word per leg (~8 bytes + null
    * bit), so per-row overhead grows O(N) with arity — the stage win
    * dominates at typical arities; at extreme arity (≥~100 legs)
    * weigh the slot overhead against the old chained-join plan.
    */
  def cogroupBy(legs: Seq[(Leg, String)], outKey: String = "key", joinNil: Boolean = false): DataFrame = {
    require(legs.size >= 2, "cogroupBy needs at least 2 inputs")
    val slotTypes = legs.map { case (l, _) =>
      org.apache.spark.sql.types.StructType(l.df.schema.fields.filterNot(_.name == l.key))
    }
    val tagged = legs.zipWithIndex.map { case ((l, _), i) =>
      val valueCols = l.df.columns.filterNot(_ == l.key).map(col)
      val slots = legs.indices.map { j =>
        if (j == i) struct(valueCols.toIndexedSeq: _*).as(s"__v_$j")
        else lit(null).cast(slotTypes(j)).as(s"__v_$j")
      }
      l.df.select(col(l.key).as(outKey) +: slots: _*)
    }
    val all = tagged.reduce(_ unionByName _)
    val nonNil = all.where(col(outKey).isNotNull)
    // nil-keyed rows: drop per-leg (dropNil), group together (joinNil —
    // GROUP BY puts all null keys in one group, matching <=> joins), or
    // default: one singleton group per nil element
    val nilRows = legs.zipWithIndex.foldLeft(all.where(col(outKey).isNull)) {
      case (df, ((l, _), i)) => if (l.dropNil) df.where(col(s"__v_$i").isNull) else df
    }
    val aggs = legs.zipWithIndex.map { case ((_, tag), i) =>
      collect_list(col(s"__v_$i")).as(tag)
    }
    val grouped = (if (joinNil) nonNil.unionByName(nilRows) else nonNil)
      .groupBy(col(outKey)).agg(aggs.head, aggs.tail: _*)
    val withSingletons =
      if (joinNil) grouped
      else grouped.unionByName(nilRows.select(
        col(outKey) +: legs.zipWithIndex.map { case ((_, tag), i) =>
          when(col(s"__v_$i").isNotNull, array(col(s"__v_$i")))
            .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(slotTypes(i))))
            .as(tag)
        }: _*))
    legs.foldLeft(withSingletons) { case (df, (l, tag)) =>
      if (l.required) df.where(size(col(tag)) > 0) else df
    }
  }

  /** Aggregate-form cogroup: when downstream only needs per-leg
    * aggregates (counts/sums/…), skip materializing the per-key value
    * lists entirely — each leg pre-aggregates, then the grouped legs
    * full-outer join exactly like [[cogroupBy]]. The scale variant for
    * unbounded per-key cardinality (SCALING.md known-limit 1). Aggs
    * are coalesced to `emptyValue` for keys absent on a leg. */
  def cogroupAgg(legs: Seq[(Leg, Seq[(Column, String)])], outKey: String = "key",
                 emptyValue: Column = lit(0)): DataFrame = {
    require(legs.size >= 2, "cogroupAgg needs at least 2 inputs")
    val grouped = legs.zipWithIndex.map { case ((l, aggs), i) =>
      val named = aggs.map { case (c, as) => c.as(as) } :+ count(lit(1)).as(s"__present_$i")
      l.df.where(col(l.key).isNotNull)
        .groupBy(col(l.key).as(outKey))
        .agg(named.head, named.tail: _*)
    }
    val joined = grouped.reduceLeft { (a, b) =>
      a.join(b.withColumnRenamed(outKey, "__rk"), col(outKey) === col("__rk"), "full_outer")
        .withColumn(outKey, coalesce(col(outKey), col("__rk"))).drop("__rk")
    }
    val filtered = legs.zipWithIndex.foldLeft(joined) { case (df, ((l, _), i)) =>
      if (l.required) df.where(col(s"__present_$i").isNotNull) else df
    }
    val coalesced = legs.flatMap(_._2.map(_._2)).foldLeft(filtered) { (df, as) =>
      df.withColumn(as, coalesce(col(as), emptyValue))
    }
    coalesced.drop(legs.indices.map(i => s"__present_$i"): _*)
  }

  /** Typed 2-way cogroup (reference 2-input `cogroup-by`), via
    * KeyValueGroupedDataset.cogroup. */
  def cogroupTyped[K: Encoder, A, B, O: Encoder](
      a: Dataset[A], keyA: A => K,
      b: Dataset[B], keyB: B => K)(
      f: (K, Iterator[A], Iterator[B]) => IterableOnce[O]): Dataset[O] =
    a.groupByKey(keyA).cogroup(b.groupByKey(keyB))((k, as, bs) => f(k, as, bs).iterator)

  /** Sorted-iterator group-by-key — the huge-key variant of
    * [[groupByKey]]: each group's values stream in `sortExprs` order
    * straight off Spark's external (spilling) sort, with no
    * `collect_list` and no per-group memory, so an unbounded hot key
    * degrades to disk instead of OOMing an executor. */
  def groupByKeySorted[K: Encoder, V, O: Encoder](
      ds: Dataset[V], key: V => K, sortExprs: Column*)(
      f: (K, Iterator[V]) => IterableOnce[O]): Dataset[O] =
    ds.groupByKey(key).flatMapSortedGroups(sortExprs: _*)((k, it) => f(k, it).iterator)

  /** Sorted-iterator 2-way cogroup for huge keys: both legs' iterators
    * stream in sorted order off the external sort (nothing
    * materialized per key) — the escape hatch when per-key cardinality
    * is unbounded and [[cogroupAgg]]'s aggregate form doesn't fit. */
  def cogroupTypedSorted[K: Encoder, A, B, O: Encoder](
      a: Dataset[A], keyA: A => K, sortA: Seq[Column],
      b: Dataset[B], keyB: B => K, sortB: Seq[Column])(
      f: (K, Iterator[A], Iterator[B]) => IterableOnce[O]): Dataset[O] =
    a.groupByKey(keyA).cogroupSorted(b.groupByKey(keyB))(sortA: _*)(sortB: _*)(
      (k, as, bs) => f(k, as, bs).iterator)

  /** `distinct` (core.clj:1741-1756). */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** `distinct-by` (core.clj:1948-1980): dedup by key, arbitrary
    * survivor — Spark's dropDuplicates has the same contract. */
  def distinctBy(df: DataFrame, keys: Seq[String]): DataFrame = df.dropDuplicates(keys)

  /** Deterministic variant: survivor = first row by `order` within key.
    * (The reference's contract is "arbitrary survivor"; determinism is
    * what a differential-testing oracle needs.) */
  def distinctByFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** `sample` (core.clj:1758-1782), three scopes.
    * - any:    cheap first-n (`limit`)
    * - global: uniform fixed-size without replacement (seeded)
    * - perKey: n per key via windowed rank over seeded rand —
    *           never collects a whole group (SURVEY §7.4). */
  def sampleAny(df: DataFrame, n: Int): DataFrame = df.limit(n)

  /** Fixed-size uniform global sample without a total sort: distributed
    * reservoir via RDD takeSample (two narrow passes — count + sampled
    * scan — instead of a full shuffle sort; the sample itself is small
    * by contract, like Beam's Sample.fixedSizeGlobally). Retained as
    * the RDD-takeSample parity form; production pipelines should
    * prefer [[sampleByHash]] — same cost shape, but reproducible
    * across partitioning/retries and SQL-expressible for differential
    * testing. */
  def sampleGlobal(df: DataFrame, n: Int, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val rows = df.rdd.takeSample(withReplacement = false, n, seed)
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq), df.schema)
  }

  /** Deterministic fixed-size global sample: order by a stable salted
    * hash of the id and take the first n. Unlike [[sampleGlobal]] the
    * result is reproducible across partitioning/cluster changes and
    * retries, DataFrame-native (Spark compiles orderBy+limit to
    * TakeOrderedAndProject — per-partition top-n merged on the driver,
    * no full sort shuffle, no driver round-trip of the corpus), and
    * SQL-expressible for differential testing. md5 is the hash because
    * the oracle side computes the identical lowercase hex; the seed
    * salts it so different seeds draw different (but each fully
    * reproducible) samples. */
  def sampleByHash(df: DataFrame, id: String, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(md5(org.apache.spark.sql.functions.concat(
      col(id).cast("string"), lit(seed.toString))), col(id)).limit(n)

  /** n per key via windowed rank over seeded rand. Parity twin of
    * Beam's Sample.fixedSizePerKey — but `rand(seed)` is evaluated
    * per-partition, so the drawn rows depend on physical partitioning
    * and are NOT stable across repartitioning or retries; prefer
    * [[samplePerKeyByHash]] when reproducibility matters. */
  def samplePerKey(df: DataFrame, keys: Seq[String], n: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(rand(seed))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n).drop("__rn")
  }

  /** Deterministic n-per-key sample: the [[sampleByHash]] trick inside
    * the window — rank each key's rows by a salted md5 of the id and
    * keep the first n. Same single-shuffle window cost as
    * [[samplePerKey]], but the draw depends only on (id, seed), so it
    * is identical across partitioning, cluster size, and retries, and
    * SQL-expressible for differential testing. The id tie-break keeps
    * the order total even if two ids ever hashed alike — PROVIDED ids
    * are unique within a key: rows sharing an id tie on both hash and
    * id, and which of them ranks first is partition-dependent, so the
    * reproducibility contract requires a unique id column. */
  def samplePerKeyByHash(df: DataFrame, keys: Seq[String], id: String, n: Int,
                         seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(md5(org.apache.spark.sql.functions.concat(
        col(id).cast("string"), lit(seed.toString))), col(id))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n).drop("__rn")
  }

  /** `flatten` (core.clj:1784-1797): iterable column → elements. */
  def flattenCol(df: DataFrame, arr: Column, as: String): DataFrame =
    df.select(explode(arr).as(as))

  /** `concat` (core.clj:1799-1821): bag union, duplicates kept. */
  def concat(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** Skew-mitigation join (SURVEY §7.4 rule 5): when one side has hot
    * keys too large for a single shuffle partition and the other side
    * is too big to broadcast, salt the skewed side with a random
    * 0..salt-1 column and replicate the other side across all salt
    * values, joining on (keys, salt). Inner/left-outer only (the
    * replicated side would double-count under right/full outer).
    * Complementary to AQE's automatic skew-join splitting, which only
    * covers sort-merge joins without downstream constraints. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins, got $joinType")
    val sl = skewed.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val ol = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    sl.join(ol, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Bloom-filter semi-join reduction — keep `df` rows whose `key`
    * appears in `keys` (EXACT `IN`-subquery semantics) while letting
    * most non-matching rows die at the SCAN instead of entering the
    * join exchange. The niche vs plain semi-join: a key side too big
    * to broadcast as a hash relation (Spark then sort-merge-shuffles
    * BOTH sides) still fits as a Bloom filter at ~10 bits/key, so the
    * big side's exchange carries only candidate rows (true matches +
    * the fpp tail). Complementary to Spark's automatic runtime bloom
    * (`spark.sql.optimizer.runtime.bloomFilter.*`), which only fires
    * under planner thresholds — this form is explicit and guaranteed.
    *
    * Mechanism (the [[graft.functions.Dedup.dedupAgainstSnapshot]]
    * recipe, key-generic): keys reduce to distinct string-cast values,
    * xxhash64 to longs, fold into a driver Bloom
    * (`stat.bloomFilter` — EAGER, one job at call time; the
    * columnProfile eager-tier convention), probed per row by the
    * codegen'd `BloomFilterMightContain` expression (not a UDF); the
    * surviving candidates then exact-semi-join the distinct key set,
    * killing false positives — output EQUALS the plain semi-join under
    * any fpp. NULL keys never match (equality join semantics).
    * `expectedItems` < 0 auto-sizes from the true distinct-key count
    * (one extra cheap job; a fixed guess embeds a bloom literal
    * proportional to the GUESS in every task). */
  def bloomSemiJoin(df: DataFrame, key: Column, keys: DataFrame,
                    keysKey: Column, expectedItems: Long = -1L,
                    fpp: Double = 0.03): DataFrame = {
    val (might, kd) = bloomProbe(key, keys, keysKey, expectedItems, fpp)
    df.where(might).join(kd, key.cast("string") === col("__gk"), "left_semi")
  }

  /** Anti twin of [[bloomSemiJoin]]: keep `df` rows whose `key` is NOT
    * in `keys`. The Bloom's no-false-negative guarantee works in
    * reverse: a row the filter rejects is DEFINITELY absent and passes
    * immediately without ever joining; only might-contain candidates
    * (true matches + fpp tail) enter the exact anti-join. `df` is
    * scanned twice (two complementary filters — the
    * stripRepeatedBlocks recomputation-over-materialization
    * convention; both scans are pushdown-pruned on a parquet source).
    * NULL keys: never "in" the key set, so they pass — matching
    * Spark's LEFT ANTI null semantics on an equality condition. */
  def bloomAntiJoin(df: DataFrame, key: Column, keys: DataFrame,
                    keysKey: Column, expectedItems: Long = -1L,
                    fpp: Double = 0.03): DataFrame = {
    val (might, kd) = bloomProbe(key, keys, keysKey, expectedItems, fpp)
    df.where(!might).unionByName(
      df.where(might)
        .join(kd, key.cast("string") === col("__gk"), "left_anti"))
  }

  /** Shared bloom construction: (codegen might-contain probe column,
    * lazily-materialized distinct string-cast key frame `__gk`).
    * Size-guarded (r13 review): the serialized filter rides the plan
    * as a LITERAL in every task binary and is built on the driver, so
    * above `maxFilterBytes` (default 64 MB ≈ 45M keys at fpp 0.03)
    * the probe degrades to `lit(true)` — the join silently becomes
    * the plain exact semi/anti join Catalyst would have planned
    * anyway (always correct; the stateBroadcastOk fallback
    * convention). Estimated size uses the standard optimal-bits
    * formula −n·ln(p)/ln²2. */
  private def bloomProbe(key: Column, keys: DataFrame, keysKey: Column,
                         expectedItems: Long, fpp: Double,
                         maxFilterBytes: Long = 64L << 20): (Column, DataFrame) = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp $fpp out of (0, 1)")
    require(expectedItems != 0L,
      "expectedItems must be > 0 (sized) or < 0 (auto-size)")
    val kd = graft.functions.Dedup.materializeLazily(
      keys.select(keysKey.cast("string").as("__gk"))
        .where(keysKey.isNotNull).distinct())
    val expected =
      if (expectedItems > 0L) expectedItems
      else math.max(kd.count(), 1L)
    val estBytes =
      (-expected * math.log(fpp) / (math.log(2) * math.log(2)) / 8.0).toLong
    if (estBytes > maxFilterBytes) return (lit(true), kd)
    val bloom = kd.select(xxhash64(col("__gk")).as("__bh"))
      .stat.bloomFilter("__bh", expected, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    import org.apache.spark.sql.graft.Bridge
    val might = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.expression(lit(bytes.toByteArray)),
        Bridge.expression(xxhash64(key.cast("string")))))
    (might, kd)
  }

  /** Set ops (core.clj:1823-1861). */
  def unionDistinct(dfs: Seq[DataFrame]): DataFrame = concat(dfs).distinct()
  def intersectDistinct(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def exceptDistinct(a: DataFrame, rest: Seq[DataFrame]): DataFrame =
    rest.foldLeft(a.distinct())(_ except _)
}
