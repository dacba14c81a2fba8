package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Side inputs (views) and side/multi outputs — reference §1.5
  * (datasplash core.clj:776-808 `view`, 279-290 `side-inputs`,
  * 302-314/341-360 `side-outputs`, 831-853 `partition-by`).
  */
object SideArtifacts {

  /** View shapes (reference `view` core.clj:789-808). A Beam
    * PCollectionView is a materialized small collection shared with all
    * workers; the Spark-native forms are either a broadcast-hash join
    * (preferred — stays distributed) or a driver-collected value for
    * genuine scalar/side use. These collect and must only be used on
    * small inputs — same constraint Beam views have.
    */
  def viewSingleton(df: DataFrame): Row = df.head()

  def viewList(df: DataFrame): Seq[Row] = df.collect().toSeq

  def viewMap(df: DataFrame, key: String, value: String): Map[Any, Any] =
    df.select(col(key), col(value)).collect().map(r => r.get(0) -> r.get(1)).toMap

  def viewMultiMap(df: DataFrame, key: String, value: String): Map[Any, Seq[Any]] =
    df.select(col(key), col(value)).collect().groupBy(_.get(0))
      .map { case (k, rs) => k -> rs.map(_.get(1)).toSeq }

  /** The scalable side-input form: broadcast-hash join of a small dim
    * (reference's main side-input use case, e.g. examples.clj join of a
    * small lookup). `broadcast()` pins the strategy; Catalyst would also
    * auto-broadcast under the threshold. */
  def withSideInput(big: DataFrame, dim: DataFrame, cond: Column, joinType: String = "left"): DataFrame =
    big.join(broadcast(dim), cond, joinType)

  /** Side outputs (reference core.clj:302-360): one pass computes a tag,
    * result cached, one filtered DataFrame per tag. */
  def sideOutputs(df: DataFrame, tagExpr: Column, tags: Seq[String]): Map[String, DataFrame] = {
    val tagged = df.withColumn("__tag", tagExpr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tags.map(t => t -> tagged.where(col("__tag") === t).drop("__tag")).toMap
  }

  /** `partition-by` (core.clj:831-853, Beam Partition): split into N
    * DataFrames by a partition-index expression in [0, n). */
  def partitionInto(df: DataFrame, n: Int, idxExpr: Column): Seq[DataFrame] = {
    val tagged = df.withColumn("__part", idxExpr.cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (0 until n).map(i => tagged.where(col("__part") === i).drop("__part"))
  }
}
