package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal joins Spark lacks as built-ins — as-of (point-in-time) and
  * interval range joins. No reference analog (datasplash has neither);
  * they are training-data-pipeline staples (point-in-time feature
  * lookup, event-in-session attribution), built here from
  * shuffle-on-derived-key primitives — never a cartesian theta join.
  */
object Temporal {

  /** As-of join: for each left row, the most recent right row with
    * `rts <= lts` (inclusive) on the same key — point-in-time
    * semantics. Right columns come back nested as a single struct
    * column `asofCol` (null struct = no match, i.e. ASOF LEFT JOIN).
    *
    * Execution: both sides are tagged and unioned, then a single
    * window pass per key carries the latest right payload forward
    * (right sorts before left at equal ts, making the match
    * inclusive). One shuffle on the key + one spilling sort — no
    * per-row subquery, no interval explosion, and hot keys spill
    * instead of materializing.
    *
    * Ties on (key, rts) are broken arbitrarily — dedupe the right side
    * first for strict determinism. `tolerance` (same units as the ts
    * columns, which must be numeric when it is set) nulls out matches
    * older than `lts - tolerance` (backward) / newer than
    * `lts + tolerance` (forward).
    *
    * `direction = "backward"` (default) matches the most recent right
    * row with `rts <= lts`; `"forward"` the EARLIEST right row with
    * `rts >= lts` — the "next event after" lookup (next maintenance
    * window, next price tick). Same single-shuffle window shape; only
    * the frame direction and the equal-ts tag order flip.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               lts: String, rts: String, asofCol: String = "asof",
               tolerance: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    // at equal ts the right row must fall INSIDE the left row's frame:
    // backward frames end at the current row → right sorts first (0);
    // forward frames start at the current row → right sorts last (1)
    val leftTag = if (fwd) 0 else 1
    val lpayT = StructType(left.schema.fields)
    val rpayT = StructType(right.schema.fields)
    val l = left.select(col(key).as("__k"), col(lts).as("__t"),
      lit(leftTag).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lpay"),
      lit(null).cast(rpayT).as("__rpay"))
    val r = right.select(col(key).as("__k"), col(rts).as("__t"),
      lit(1 - leftTag).as("__side"),
      lit(null).cast(lpayT).as("__lpay"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__rpay"))
    val w0 = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
    val (w, pick) =
      if (fwd) (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
        (c: org.apache.spark.sql.Column) => first(c, ignoreNulls = true))
      else (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
        (c: org.apache.spark.sql.Column) => last(c, ignoreNulls = true))
    val matched = l.unionByName(r)
      .withColumn(asofCol, pick(col("__rpay")).over(w))
      .where(col("__side") === leftTag)
    val bounded = tolerance.fold(matched) { tol =>
      val gap =
        if (fwd) col(asofCol)(rts) - col("__t") else col("__t") - col(asofCol)(rts)
      matched.withColumn(asofCol, when(gap <= tol, col(asofCol)))
    }
    bounded.select(col("__lpay.*"), col(asofCol))
  }

  /** Range (interval) join: left point rows with `pt` ∈ [start, end)
    * of right interval rows — no equi key required. All three columns
    * must be integral (e.g. epoch nanos) and `end > start`.
    *
    * Execution: intervals are exploded onto fixed-width chunks
    * (`chunkWidth` >= the max interval length ⇒ at most 2 chunks
    * each); each point lands in exactly one chunk, so the join is an
    * equi-join on the derived chunk id plus the exact range predicate.
    * Shuffle cost O(|points| + 2·|intervals|), never |points|×|intervals|,
    * and no dedup pass is needed — a point can match an interval only
    * in the point's own chunk.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pt: String, start: String, end: String,
                chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    val p = points.withColumn("__chunk", expr(s"`$pt` div ${chunkWidth}L"))
    val i = intervals.withColumn("__chunk", explode(sequence(
      expr(s"`$start` div ${chunkWidth}L"),
      expr(s"(`$end` - 1) div ${chunkWidth}L"))))
    p.join(i, Seq("__chunk"))
      .where(col(pt) >= col(start) && col(pt) < col(end))
      .drop("__chunk")
  }
}
