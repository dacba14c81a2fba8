package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines — source
  * mixing, deterministic splits, and sketch aggregates. No reference
  * analog (datasplash has none); all narrow/columnar, designed for the
  * 100 TB path (sampling and hashing are map-side, sketches are
  * mergeable partial aggregates).
  */
object Corpus {

  /** Weighted mixture of sources: sample each source at its weight and
    * union — the standard corpus-mixing step (e.g. 3 parts web, 1 part
    * code). Weights are independent Bernoulli rates in [0, 1]; rows are
    * never duplicated (use `unionAll` of self-unions for >1 rates).
    * Deterministic per seed; entirely map-side (no shuffle). */
  def mixByWeights(sources: Seq[(DataFrame, Double)], seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.zipWithIndex.map { case ((df, w), i) =>
      require(w >= 0 && w <= 1, s"weight $w outside [0,1]")
      df.sample(withReplacement = false, w, seed + i)
    }.reduce(_ unionByName _)
  }

  /** Deterministic train/holdout split on a stable id hash: a row
    * lands in holdout iff `xxhash64(id, seed) mod denom < numer`.
    * Hash-based (not `rand()`) so the split survives retries,
    * repartitioning, and incremental reruns — the property a training
    * pipeline actually needs. Returns (train, holdout). Map-side. */
  def splitByHash(df: DataFrame, id: Column, holdoutNumer: Int,
                  holdoutDenom: Int, seed: Long = 42L): (DataFrame, DataFrame) = {
    require(holdoutNumer >= 0 && holdoutNumer <= holdoutDenom && holdoutDenom > 0)
    val bucket = pmod(xxhash64(id, lit(seed)), lit(holdoutDenom))
    (df.where(bucket >= holdoutNumer), df.where(bucket < holdoutNumer))
  }

  /** HyperLogLog++ distinct-count sketch (mergeable partial aggregate;
    * `rsd` = target relative standard deviation). The approximate twin
    * of `count_distinct` for 100 TB cardinalities where the exact
    * shuffle is the bottleneck. */
  def approxCountDistinct(e: Column, rsd: Double = 0.01): Column =
    approx_count_distinct(e, rsd)

  /** Approximate percentile sketch (Greenwald-Khanna; `accuracy` ↑ =
    * tighter bounds, more memory). The approximate twin of the exact
    * `percentile` used by q_percentile. */
  def approxPercentile(e: Column, percentage: Double, accuracy: Int = 10000): Column =
    percentile_approx(e, lit(percentage), lit(accuracy))
}
