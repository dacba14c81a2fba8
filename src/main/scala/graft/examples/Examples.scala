package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api
import graft.operators.Transforms

/** End-to-end example pipelines mirroring the reference's
  * examples.clj: WordCount (examples.clj:23-54) and a windowed
  * event-analytics pipeline (examples.clj:296-327 shape, batch or
  * streaming via the unified API).
  */
object WordCount {
  /** args: <inputTextPathOrDir> <outputDir> */
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val spark = api.session.build(api.session.Config(appName = "graft-wordcount"))
    run(spark, in, out)
    spark.stop()
  }

  def run(spark: SparkSession, in: String, out: String): Unit = {
    import spark.implicits._
    val counts = api.io.readTextFile(spark, in).toDF("line")
      .transform(Transforms.compose(
        df => df.select(explode(split(lower($"line"), "[^\\p{L}]+")).as("word")),
        df => df.where(length($"word") > 0),
        df => api.combiners.frequencies(df, $"word", "word")))
      .orderBy($"count".desc, $"word")
    api.io.writeJsonFile(counts, out, numShards = 1)
  }
}

/** Sessionized event analytics over the testdata events table:
  * per-user session revenue with a 30-minute gap, the batch form of
  * the reference's streaming example. */
object SessionAnalytics {
  /** args: <sfDir> <outputDir> */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, out) = args.take(2)
    val spark = api.session.build(api.session.Config(appName = "graft-sessions"))
    import spark.implicits._
    val sessions = api.io.readTable(spark, sfDir, "events")
      .groupBy($"user_id", api.windows.sessionWindow($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("session_value"))
      .select($"user_id", unix_timestamp($"sw.start").as("session_start"),
        $"n_events", $"session_value")
    api.io.writeParquet(sessions, out)
    spark.stop()
  }
}
