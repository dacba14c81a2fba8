package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Document-store connector analogs.
  *
  * Elasticsearch (reference es.clj:96-156): the engine-side capability
  * is a JSON-document sink with dynamic routing (`index-fn`) and
  * explicit ids (`id-fn`) — here a routed JSON-lines write; a real
  * cluster client would consume the same shape.
  *
  * Datastore (reference datastore.clj:44-176): a bidirectional
  * row ⇄ entity codec — entities are (key{kind,name}, properties{...})
  * structs with optional ancestor path, exactly the reference's
  * Clojure⇄Entity mapping re-expressed as nested columns.
  */
object Documents {

  /** ES-style routed document write: `indexCol` = dynamic index
    * (es.clj `index-fn`), `idCol` = document id (`id-fn`). */
  def writeDocuments(df: DataFrame, path: String, indexCol: Column, idCol: Column,
                     mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("_id", idCol.cast("string"))
      .withColumn("__index", indexCol)
      .write.mode(mode).partitionBy("__index").json(path)

  /** ES-style document read (es.clj:17-95: scroll `:query` over an
    * index → maps). Reads a routed document tree (the shape
    * [[writeDocuments]] produces), restoring the dynamic index as
    * `_index`; `query` is the `:query` analog — a plain predicate that
    * Catalyst pushes into the scan, the batch equivalent of a filtered
    * scroll; `fields` mirrors the `_source` include list. Scroll
    * pagination itself dissolves: a distributed scan is already
    * batched per partition. */
  def readDocuments(spark: SparkSession, path: String,
                    query: Option[Column] = None,
                    fields: Seq[String] = Nil): DataFrame = {
    val df = spark.read.json(path).withColumnRenamed("__index", "_index")
    val filtered = query.fold(df)(df.filter)
    if (fields.isEmpty) filtered
    else filtered.select(("_index" +: "_id" +: fields).distinct.map(col): _*)
  }

  /** Rows → entities: key(kind, name[, parent path]) + properties
    * struct of all remaining columns (datastore.clj:164-176
    * `make-ds-entity`). */
  def toEntities(df: DataFrame, kind: String, keyCol: String,
                 ancestors: Seq[(String, Column)] = Nil): DataFrame = {
    val props = df.columns.filterNot(_ == keyCol).map(col)
    val path = array(ancestors.map { case (k, n) =>
      struct(lit(k).as("kind"), n.cast("string").as("name"))
    } :+ struct(lit(kind).as("kind"), col(keyCol).cast("string").as("name")): _*)
    df.select(struct(path.as("path")).as("key"),
      struct(props.toIndexedSeq: _*).as("properties"))
  }

  /** Entities → rows: re-flatten properties and surface the leaf key
    * (datastore.clj:73-94 `entity->clj`). */
  def fromEntities(df: DataFrame, keyAs: String = "key_name"): DataFrame =
    df.select(element_at(col("key.path"), -1).getField("name").as(keyAs) +:
      df.select(col("properties.*")).columns.map(c => col(s"properties.$c")).toIndexedSeq: _*)
}
