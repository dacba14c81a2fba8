package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

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

  /** Event-level sessionization: assign each row its per-key session
    * index (0-based) under the gap rule — a new session starts when
    * the time since the previous event reaches `gap` (same units as
    * `ts`, e.g. nanos with a ns gap; `>= gap` breaks, matching
    * Beam/Spark session windows' `[t, t+gap)` merge rule). The
    * event-granular complement of [[sessionWindow]] (which
    * aggregates): one shuffle on the key, one spilling sort, a lag +
    * running sum — no per-group materialization. */
  def sessionize(df: DataFrame, key: Column, ts: Column, gap: Long,
                 as: String = "session_idx"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val prev = lag(ts, 1).over(w)
    val isBreak = when(prev.isNull, lit(0L))
      .otherwise(when(ts - prev >= gap, lit(1L)).otherwise(lit(0L)))
    df.withColumn(as,
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** `with-timestamp` (core.clj:316-326): event time is just a column;
    * in streaming add the watermark (allowed-lateness analog,
    * core.clj:2087-2090). */
  def withEventTime(df: DataFrame, ts: Column, as: String = "event_time"): DataFrame =
    df.withColumn(as, ts)

  def withLateness(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Beam `:accumulate-mode` (core.clj:2082-2094) → Spark output mode:
    * `:accumulate` ≈ Update — every trigger re-emits the refined pane,
    * so late data within the watermark updates the emitted row;
    * `:discard` ≈ Append — exactly one final firing per window, once
    * the watermark closes it. Spark has no per-pane delta firing; the
    * mapping (and its limits) is documented in SURVEY §2.5 and
    * spec-exercised on a late-data file stream. */
  def accumulationMode(mode: String): OutputMode = mode match {
    case "accumulate" => OutputMode.Update()
    case "discard"    => OutputMode.Append()
    case other => throw new IllegalArgumentException(s"unknown accumulate-mode: $other")
  }

  /** Beam `:trigger` (core.clj:2082-2094) → Spark query trigger:
    * repeated processing-time firings, a one-shot drain of available
    * data (AvailableNow), or continuous processing. Triggers are
    * per-query in Spark, not per-window. */
  def triggerOf(kind: String, interval: String = "0 seconds"): Trigger = kind match {
    case "processing-time" => Trigger.ProcessingTime(interval)
    case "available-now"   => Trigger.AvailableNow()
    case "continuous"      => Trigger.Continuous(interval)
    case other => throw new IllegalArgumentException(s"unknown trigger kind: $other")
  }

  /** Apply the reference's window output options to a stream writer
    * (`:allowed-lateness` lives on the DataFrame via [[withLateness]]). */
  def withWindowOptions[T](w: DataStreamWriter[T],
                           accumulateMode: String = "discard",
                           trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[T] =
    w.outputMode(accumulationMode(accumulateMode)).trigger(trigger)
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
    * (processing order fixed by `ord` instead of arrival order).
    *
    * Reference-parity form: the in-memory group sort bounds per-key
    * cardinality by executor memory. The scale paths are
    * [[runningAgg]] (columnar window aggregate, spilling sort) for
    * aggregate-shaped state and [[runningByKeySorted]] (external-sort
    * partitions, streamed state) for arbitrary step functions. */
  def runningByKey[K: Encoder, V, S, O: Encoder, B: Ordering](
      ds: Dataset[V], key: V => K, ord: V => B, zero: S)(
      step: (S, V) => (S, O)): Dataset[O] =
    ds.groupByKey(key).flatMapGroups { (_: K, it: Iterator[V]) =>
      val sorted = it.toIndexedSeq.sortBy(ord)
      sorted.iterator.scanLeft((zero, null.asInstanceOf[O])) {
        case ((s, _), v) => step(s, v)
      }.drop(1).map(_._2)
    }

  /** Spill-safe running aggregate: `agg` over an ordered per-key
    * running window (rows unbounded-preceding → current). Spark's
    * window operator sorts with the external (spilling) sorter, so a
    * hot key degrades to disk instead of OOMing an executor — the
    * 100 TB path for aggregate-shaped running state. */
  def runningAgg(df: DataFrame, keys: Seq[Column], ord: Seq[Column],
                 agg: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, agg.over(w))
  }

  /** Spill-safe generic running state for arbitrary step functions:
    * repartition by key, external-sort each partition on (key, ord),
    * then stream every partition once, resetting state at key
    * boundaries. Never holds a whole group in memory (unlike
    * [[runningByKey]]'s group sort). `ord` values sort by Spark's
    * column ordering of the encoded type — tuples compare
    * lexicographically field-by-field, matching Scala's Ordering for
    * the usual numeric/string cases. */
  def runningByKeySorted[K: Encoder, V: Encoder, S, O: Encoder, B: Encoder](
      ds: Dataset[V], key: V => K, ord: V => B, zero: S)(
      step: (S, V) => (S, O)): Dataset[O] = {
    implicit val kbv: Encoder[(K, B, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[B]], implicitly[Encoder[V]])
    ds.map(v => (key(v), ord(v), v))
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions { it =>
        var cur: Option[K] = None
        var state = zero
        it.map { case (k, _, v) =>
          if (!cur.contains(k)) { cur = Some(k); state = zero }
          val (s2, o) = step(state, v)
          state = s2
          o
        }
      }
  }
}
