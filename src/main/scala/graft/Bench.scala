package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SparkEntry.benchQueries)
  * against SPARK_GRAFT_SF_DIR with a noop sink (full materialization,
  * no write cost) and prints one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/file-listing costs land here, not in q1
    try SparkEntry.queries(SparkEntry.benchQueries.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // Each query runs `iters` times in-JVM and reports the MEDIAN: the
    // single-iteration timing carried ±15-20% machine noise, which made
    // round-over-round per-query deltas meaningless (two straight rounds
    // of >20% phantom swings on untouched queries). `queries` keeps the
    // name→seconds shape (now the median) so the series stays parseable;
    // the raw runs land in `runs` for anyone auditing the spread.
    def time(names: Seq[String]): Seq[(String, Seq[Double])] = names.map { name =>
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        // lookup inside the try: a stale name in a bench tier must land
        // in failed[], not abort the run before any JSON is emitted
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed += name
          System.err.println(s"[bench] $name: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> runs
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def json(rs: Seq[(String, Seq[Double])]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + median(v) }.mkString("{", ",", "}")
    def jsonRuns(rs: Seq[(String, Seq[Double])]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v.mkString("[", ",", "]") }
        .mkString("{", ",", "}")
    val results = time(SparkEntry.benchQueries)
    // v2 tier: never-timed families, separate total — the headline
    // `value` stays the frozen 22-query series for comparability
    val resultsV2 = time(SparkEntry.benchQueriesV2)
    val total = results.map(r => median(r._2)).sum
    val totalV2 = resultsV2.map(r => median(r._2)).sum
    // a failed query's (partial) duration stays in its per-query slot
    // for series continuity, but the failure is named — a totals diff
    // must never read a crash as a speedup
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${json(results)},""" +
      s""""total_v2":$totalV2,"queries_v2":${json(resultsV2)},""" +
      s""""iters":$iters,"runs":${jsonRuns(results)},"runs_v2":${jsonRuns(resultsV2)},""" +
      s""""failed":$failedJson,"sf":"$sfDir"}"""
    // stdout (unprefixed — build.sbt sets run/outputStrategy) AND a file
    // copy, so the driver can parse either way.
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}
