package graft.examples

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{api, GraftSession}
import graft.operators.{Combiners, Transforms}
import graft.sources.{Documents, GraftIO}

/** The reference's example pipelines (examples.clj:17-328, themselves
  * ports of the classic Dataflow cookbook examples) re-expressed with
  * graft's Spark-first API. Each pipeline is a pure function over
  * DataFrames — runnable on any input and asserted end-to-end by
  * ExamplesSpec — plus a `main` dispatcher mirroring the reference's
  * `-main` (examples.clj:333-351).
  */
object Examples {

  // ---------------- WordCount (examples.clj:17-54) -------------------

  /** `tokenize` (examples.clj:23-26): split on non-letters/apostrophes,
    * drop empties. Columnar — stays in codegen, no UDF. */
  def tokenize(line: Column): Column =
    filter(split(trim(line), "[^a-zA-Z']+"), t => length(t) > 0)

  /** `count-words` (examples.clj:27-31): mapcat tokenize → frequencies. */
  def countWords(lines: DataFrame, line: Column): DataFrame =
    Combiners.frequencies(
      lines.select(explode(tokenize(line)).as("word")), col("word"), "word")

  /** `format-count` (examples.clj:33-35): "word: n" lines. */
  def formatCounts(counts: DataFrame): Dataset[String] = {
    implicit val e = counts.sparkSession.implicits.newStringEncoder
    counts.select(concat(col("word"), lit(": "), col("count")).as("s")).as[String]
  }

  /** `run-word-count` (examples.clj:45-54). */
  def runWordCount(spark: SparkSession, input: String, output: String,
                   numShards: Int = 0): Unit =
    GraftIO.writeTextFile(
      formatCounts(countWords(GraftIO.readTextFile(spark, input).toDF("line"), col("line"))),
      output, numShards = numShards)

  // ---------------- DeDup (examples.clj:56-75) -----------------------

  /** `run-dedup` (examples.clj:68-75): read → distinct → write. */
  def runDedup(spark: SparkSession, input: String, output: String): Unit = {
    val lines = GraftIO.readTextFile(spark, input)
    GraftIO.writeTextFile(lines.distinct(), output)
  }

  // ---------------- Filter (examples.clj:77-122) ---------------------

  /** `run-filter`'s core (examples.clj:91-113): project readings, take
    * the global mean as a side input (broadcast 1-row aggregate, the
    * `ds/view` pattern), keep rows of `monthFilter` below that mean.
    * Input shape: (year, month, day, mean_temp). */
  def filterBelowGlobalMean(readings: DataFrame, monthFilter: Int): DataFrame = {
    val projected = readings.select(
      col("year").cast("int"), col("month").cast("int"),
      col("day").cast("int"), col("mean_temp").cast("double"))
    // ds/view + side-inputs: a 1-row aggregate cross-joined in — Spark
    // broadcasts it, so the comparison stays map-side at any scale.
    val globalMean = projected.agg(avg(col("mean_temp")).as("__global_mean"))
    projected
      .where(col("month") === monthFilter)
      .crossJoin(broadcast(globalMean))
      .where(col("mean_temp") < col("__global_mean"))
      .drop("__global_mean")
  }

  // ---------------- CombinePerKey (examples.clj:124-156) -------------

  /** `run-combine-per-key`'s core (examples.clj:138-156): words longer
    * than `minWordLength` → per-key string-join of the plays they
    * appear in (sorted for determinism; the reference's combine order
    * is arbitrary). Input shape: (word, corpus). */
  def combinePerKey(words: DataFrame, minWordLength: Int): DataFrame =
    words.where(length(col("word")) > minWordLength)
      .groupBy(col("word"))
      .agg(array_join(sort_array(collect_set(col("corpus"))), ",").as("all_plays"))

  // ---------------- MaxPerKey (examples.clj:158-187) -----------------

  /** `run-max-per-key`'s core (examples.clj:170-187): month → max mean
    * temperature. Input shape: (month, mean_temp). */
  def maxPerKey(readings: DataFrame): DataFrame =
    Combiners.combineBy(readings, col("month").cast("int").as("month"),
      max(col("mean_temp").cast("double")).as("max_mean_temp"))

  // ---------------- StandardSQL WordCount (examples.clj:189-214) -----

  /** `run-standard-sql-query` (examples.clj:205-214): the same corpus
    * through the SQL surface — words with more than `minCount` total
    * occurrences. Registers `words` as a temp view. */
  def sqlWordCount(spark: SparkSession, words: DataFrame, minCount: Long): DataFrame = {
    words.createOrReplaceTempView("words")
    spark.sql(
      s"""SELECT word, sum(word_count) AS total
         |FROM words GROUP BY word HAVING total > $minCount
         |ORDER BY total DESC, word""".stripMargin)
  }

  // ---------------- DatastoreWordCount (examples.clj:216-282) --------

  /** `run-datastore-word-count`'s write leg (examples.clj:254-282):
    * word counts as Datastore-shaped entities under an ancestor key,
    * persisted as parquet. */
  def datastoreWordCount(spark: SparkSession, input: String, output: String,
                         ancestor: String = "root"): Unit = {
    val counts = countWords(GraftIO.readTextFile(spark, input).toDF("line"), col("line"))
    val entities = Documents.toEntities(counts, kind = "WordCount", keyCol = "word",
      ancestors = Seq("Line" -> lit(ancestor)))
    entities.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(output)
  }

  // ---------------- Pub/Sub (examples.clj:284-327) -------------------

  /** `run-pub-sub`'s transform (examples.clj:296-327): interactions
    * arrive as messages (payload + attributes), get forwarded with a
    * marker attribute. Works on the batch or streaming message shape
    * ([[Sources.asMessages]] / [[Sources.watchMessages]]). */
  def forwardInteractions(messages: DataFrame): DataFrame =
    messages.select(
      upper(col("payload")).as("payload"),
      map_concat(col("attributes"),
        map(lit("forwarded"), lit("true"))).as("attributes"),
      col("event_time"))

  // ---------------- -main (examples.clj:333-351) ---------------------

  def main(args: Array[String]): Unit = {
    val (name, rest) = (args.headOption.getOrElse(""), args.drop(1))
    def opt(k: String, dflt: String) = rest.collectFirst {
      case a if a.startsWith(s"--$k=") => a.substring(k.length + 3)
    }.getOrElse(dflt)
    // example-local args stay out of the Spark conf (fromArgs pass-through)
    val appKeys = Set("input", "output", "numShards")
    val sparkArgs = rest.filterNot(a => appKeys.exists(k => a.startsWith(s"--$k=")))
    val spark = GraftSession.build(GraftSession.fromArgs(sparkArgs,
      GraftSession.Config(appName = s"graft-example-$name")))
    name match {
      case "word-count" =>
        runWordCount(spark, opt("input", "input.txt"), opt("output", "wordcount-out"),
          opt("numShards", "0").toInt)
      case "dedup" =>
        runDedup(spark, opt("input", "input.txt"), opt("output", "dedup-out"))
      case "datastore-word-count" =>
        datastoreWordCount(spark, opt("input", "input.txt"), opt("output", "entities-out"))
      case other =>
        System.err.println(
          s"unknown example '$other' — one of: word-count dedup datastore-word-count")
    }
    spark.stop()
  }
}

/** The original JSON-output WordCount main (examples.clj:23-54) kept
  * as a standalone runnable — lowercased `\p{L}` tokenization, ordered
  * output, JSON-lines sink. */
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
