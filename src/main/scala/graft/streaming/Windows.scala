package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Windowing & streaming — reference §2.5 (datasplash core.clj:2082-2155
  * fixed/sliding/session windows; ClojureStatefulDoFn.java stateful
  * per-key state; pubsub.clj / kafka.clj unbounded sources).
  *
  * Spark's unified batch/streaming DataFrame API means every window
  * helper here works identically on a batch DataFrame (testable against
  * a SQL oracle) and a streaming one (with `withWatermark`). Beam
  * trigger/pane accumulation maps to output modes: `:accumulate` ≈
  * Update, `:discard` ≈ Append; allowed-lateness ≈ watermark delay
  * (semantic difference documented in SURVEY §2.5 — Spark triggers are
  * per-query, not per-window).
  */
object Windows {

  /** `fixed-windows` (core.clj:2096-2114): tumbling windows. Returns the
    * window struct column to group by. */
  def fixedWindow(ts: Column, width: String): Column = window(ts, width)

  /** `sliding-windows` (core.clj:2116-2135). */
  def slidingWindow(ts: Column, width: String, slide: String): Column =
    window(ts, width, slide)

  /** `session-windows` (core.clj:2137-2155): gap-based, merged per
    * grouping key. */
  def sessionWindow(ts: Column, gap: String): Column = session_window(ts, gap)

  /** `with-timestamp` (core.clj:316-326): event time is just a column;
    * in streaming add the watermark (allowed-lateness analog,
    * core.clj:2087-2090). */
  def withEventTime(df: DataFrame, ts: Column, as: String = "event_time"): DataFrame =
    df.withColumn(as, ts)

  def withLateness(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
}

/** Stateful per-key processing — reference stateful ParDo
  * (`:stateful?` core.clj:226-260, ClojureStatefulDoFn.java:14-42:
  * per-key ValueState read/modify/write per element).
  */
object Stateful {

  /** Streaming exact dedup bounded by the watermark: state for a key
    * is dropped once the watermark passes it, so the state store stays
    * bounded on unbounded streams — the streaming form of the
    * training-pipeline exact-dedup operator. */
  def streamingDedup(df: DataFrame, keys: Seq[String], tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Batch/streaming stateful map over groups. In streaming this is
    * Spark's flatMapGroupsWithState (true per-key state store); in batch
    * Spark executes the same code with a one-shot state. */
  def statefulFlatMap[K: Encoder, V, S: Encoder, O: Encoder](
      ds: Dataset[V], key: V => K,
      outputMode: OutputMode = OutputMode.Append,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      f: (K, Iterator[V], GroupState[S]) => Iterator[O]): Dataset[O] =
    ds.groupByKey(key).flatMapGroupsWithState[S, O](outputMode, timeout)(f)

  /** Ordered running-state transform: for each key, sort the group by
    * `ord` and thread a state through it, emitting one output per
    * element — the deterministic batch analog of per-key ValueState
    * (processing order fixed by `ord` instead of arrival order). */
  def runningByKey[K: Encoder, V, S, O: Encoder, B: Ordering](
      ds: Dataset[V], key: V => K, ord: V => B, zero: S)(
      step: (S, V) => (S, O)): Dataset[O] =
    ds.groupByKey(key).flatMapGroups { (_: K, it: Iterator[V]) =>
      val sorted = it.toIndexedSeq.sortBy(ord)
      sorted.iterator.scanLeft((zero, null.asInstanceOf[O])) {
        case ((s, _), v) => step(s, v)
      }.drop(1).map(_._2)
    }
}
