package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Windows

/** Batch ≡ streaming differential over the REAL events table (r12
  * verdict item 3; reference windows core.clj:2082-2155, whose own
  * tests are smoke-only — api_test.clj:973-986 "TODO: add test"): the
  * SAME window helper + aggregation code, run once as a batch query
  * and once through the file streaming source in APPEND mode with a
  * watermark, must converge to the SAME final state — and a row
  * planted behind the watermark must be DROPPED, not folded in.
  *
  * Determinism: micro-batch arrival order is controlled by writing
  * time-ordered slices into the watched dir one processAllAvailable()
  * at a time, so the watermark advances monotonically between slices
  * and no in-order row is ever late (slice i+1's min event time is ≥
  * slice i's max, and the watermark trails that max by the delay); a
  * far-future sentinel row then pushes the watermark past every real
  * window so append mode flushes them all. The sentinel's own windows
  * never close (nothing later advances the watermark past them), so
  * they are excluded from the sink by construction — no filtering.
  *
  * Sums are over an integer per-row transform (value → cents as long)
  * so batch/stream agreement is exact — a double sum's add order
  * differs between one big hash aggregate and incremental state-store
  * merges, and this spec asserts EQUALITY, not a tolerance. */
class StreamingDifferentialSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def ev: DataFrame =
    graft.sources.GraftIO.readTable(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"ts", $"value")

  private def vCents = ($"value" * 100).cast("long")

  // time-ordered thirds of the 2024-01-01..01-30 event span
  private def slices: Seq[DataFrame] = Seq(
    ev.where($"ts" < lit("2024-01-11 00:00:00")),
    ev.where($"ts" >= lit("2024-01-11 00:00:00") &&
      $"ts" < lit("2024-01-21 00:00:00")),
    ev.where($"ts" >= lit("2024-01-21 00:00:00")))

  private def sentinel: DataFrame =
    Seq(Tuple3(-1L, "2024-03-01 00:00:00", 0.0))
      .toDF("user_id", "tss", "value")
      .select($"user_id", to_timestamp($"tss").as("ts"), $"value")

  /** Feed `feeds` to a fresh file-source stream one micro-batch at a
    * time under `agg` (append mode, memory sink); returns the sink. */
  private def runStream(feeds: Seq[DataFrame], agg: DataFrame => DataFrame,
                        queryName: String): DataFrame = {
    val dir = Files.createTempDirectory(s"graft-diff-$queryName").toString + "/in"
    feeds.head.write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = agg(stream).writeStream.outputMode("append")
      .format("memory").queryName(queryName).start()
    try {
      q.processAllAvailable()
      feeds.tail.foreach { s =>
        s.write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(queryName)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("fixed windows: streamed final state equals the batch query (events table)") {
    def agg(df: DataFrame) = Windows.withLateness(df, "ts", "1 hour")
      .groupBy(Windows.fixedWindow($"ts", "1 day"))
      .agg(count(lit(1)).as("cnt"), sum(vCents).as("cents"))
      .select(unix_micros($"window.start").as("ws"), $"cnt", $"cents")
    val batch = rows(agg(ev)) // withWatermark is a no-op on batch
    val streamed = rows(runStream(slices :+ sentinel, agg, "diff_fixed"))
    assert(batch.nonEmpty && streamed == batch)
  }

  test("sliding windows: streamed final state equals the batch query (events table)") {
    def agg(df: DataFrame) = Windows.withLateness(df, "ts", "1 hour")
      .groupBy(Windows.slidingWindow($"ts", "2 days", "1 day"))
      .agg(count(lit(1)).as("cnt"), sum(vCents).as("cents"))
      .select(unix_micros($"window.start").as("ws"), $"cnt", $"cents")
    val batch = rows(agg(ev))
    val streamed = rows(runStream(slices :+ sentinel, agg, "diff_sliding"))
    assert(batch.nonEmpty && streamed == batch)
  }

  test("session windows: streamed final state equals the batch query (events table)") {
    // 30-minute gap sessions per user; sessions spanning a slice
    // boundary must MERGE across micro-batches (their window hasn't
    // been closed by the trailing watermark when the next slice lands)
    def agg(df: DataFrame) = Windows.withLateness(df, "ts", "1 hour")
      .groupBy($"user_id", Windows.sessionWindow($"ts", "30 minutes"))
      .agg(count(lit(1)).as("cnt"), sum(vCents).as("cents"))
      .select($"user_id", unix_micros($"session_window.start").as("ws"),
        $"cnt", $"cents")
    val batch = rows(agg(ev))
    val streamed = rows(runStream(slices :+ sentinel, agg, "diff_session"))
    assert(batch.nonEmpty && streamed == batch)
  }

  test("late row behind the watermark is dropped, not folded into a closed window") {
    def agg(df: DataFrame) = Windows.withLateness(df, "ts", "1 hour")
      .groupBy(Windows.fixedWindow($"ts", "1 day"))
      .agg(count(lit(1)).as("cnt"), sum(vCents).as("cents"))
      .select(unix_micros($"window.start").as("ws"), $"cnt", $"cents")
    // replay of the EARLIEST event, fed after the day-21..30 slice: by
    // then the watermark sits ~1 hour behind 2024-01-30, a month past
    // the row's (already-emitted) day-1 window → the row must drop
    val late = ev.orderBy($"ts", $"user_id").limit(1)
      .withColumn("value", lit(999.0))
    val batch = rows(agg(ev))
    val batchWithLate = rows(agg(ev.unionByName(late)))
    assert(batchWithLate != batch) // the late row WOULD change the result
    val streamed =
      rows(runStream((slices :+ late) :+ sentinel, agg, "diff_late"))
    assert(streamed == batch) // …but the stream dropped it
  }
}
