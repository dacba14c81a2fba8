package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  def left = Seq((1L, "a", 1L), (2L, "a", 5L), (3L, "a", 10L), (4L, "b", 3L))
    .toDF("id", "k", "t")
  def right = Seq(("a", 2L, "s2"), ("a", 10L, "s10"), ("c", 1L, "sc"))
    .toDF("k", "rt", "tag")

  test("asOfJoin: latest right at-or-before each left ts, LEFT semantics") {
    val got = Temporal.asOfJoin(left, right, key = "k", lts = "t", rts = "rt")
      .select($"id", $"asof.tag")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      1L -> None,        // t=1 before first snapshot
      2L -> Some("s2"),  // latest <= 5
      3L -> Some("s10"), // inclusive at equal ts
      4L -> None))       // key 'b' has no right rows
  }

  test("asOfJoin tolerance nulls out stale matches") {
    val got = Temporal.asOfJoin(left, right, key = "k", lts = "t", rts = "rt",
        tolerance = Some(2L))
      .select($"id", $"asof.tag")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // id=2: t=5, match rt=2 → age 3 > 2 → nulled; id=3 age 0 kept
    assert(got(2L).isEmpty && got(3L).contains("s10") && got(1L).isEmpty)
  }

  test("rangeJoin: [start, end) membership incl. chunk-straddling intervals") {
    val points = Seq((1L, 0L), (2L, 9L), (3L, 10L), (4L, 15L), (5L, 19L), (6L, 20L))
      .toDF("pid", "t")
    // width 10: interval [9, 21) covers chunks 0,1,2; [0, 10) covers chunk 0
    val ivals = Seq((100L, 9L, 21L), (200L, 0L, 10L)).toDF("iid", "s", "e")
    val got = Temporal.rangeJoin(points, ivals, "t", "s", "e", chunkWidth = 10L)
      .select($"iid", $"pid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (100L, 2L), (100L, 3L), (100L, 4L), (100L, 5L), (100L, 6L), // 9..20 in [9,21)
      (200L, 1L), (200L, 2L)))                                    // 0, 9 in [0,10)
  }

  test("rangeJoin emits each match exactly once (no chunk-dup)") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val ivals = Seq((100L, 0L, 30L)).toDF("iid", "s", "e") // spans 3 chunks
    assert(Temporal.rangeJoin(points, ivals, "t", "s", "e", chunkWidth = 10L).count() == 1L)
  }

  test("empty-side edges: no right rows → all-null asof; no intervals → no pairs") {
    val emptyR = spark.emptyDataset[(String, Long, String)].toDF("k", "rt", "tag")
    val got = Temporal.asOfJoin(left, emptyR, key = "k", lts = "t", rts = "rt")
    assert(got.count() == left.count())
    assert(got.where($"asof".isNotNull).count() == 0)
    val emptyI = spark.emptyDataset[(Long, Long, Long)].toDF("iid", "s", "e")
    assert(Temporal.rangeJoin(left.select($"id".as("pid"), $"t"), emptyI,
      "t", "s", "e", chunkWidth = 10L).count() == 0)
  }

  test("asOfJoin matches an in-memory brute force on random data") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val keys = Vector("a", "b", "c", "d")
      val ls = (1 to 60).map(i => (i.toLong, keys(rnd.nextInt(4)), rnd.nextInt(500).toLong))
      // distinct (k, rt) so the match is deterministic by contract
      val rs = rnd.shuffle(
        for (k <- keys; rt <- 0 until 500 by 7) yield (k, rt.toLong))
        .take(50).zipWithIndex.map { case ((k, rt), i) => (k, rt, i.toLong) }
      val got = Temporal.asOfJoin(
          ls.toDF("id", "k", "t"), rs.toDF("k", "rt", "tag"),
          key = "k", lts = "t", rts = "rt")
        .select($"id", $"asof.tag")
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val expect = ls.map { case (id, k, t) =>
        id -> rs.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got == expect, s"seed=$seed")
      // forward direction: EARLIEST right at-or-after, same data
      val gotF = Temporal.asOfJoin(
          ls.toDF("id", "k", "t"), rs.toDF("k", "rt", "tag"),
          key = "k", lts = "t", rts = "rt", direction = "forward")
        .select($"id", $"asof.tag")
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val expectF = ls.map { case (id, k, t) =>
        id -> rs.filter(r => r._1 == k && r._2 >= t)
          .sortBy(_._2).headOption.map(_._3)
      }.toMap
      assert(gotF == expectF, s"forward seed=$seed")
      // forward tolerance: matches farther than tol ahead null out
      val tol = 20L
      val gotFT = Temporal.asOfJoin(
          ls.toDF("id", "k", "t"), rs.toDF("k", "rt", "tag"),
          key = "k", lts = "t", rts = "rt", tolerance = Some(tol),
          direction = "forward")
        .select($"id", $"asof.tag")
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val expectFT = ls.map { case (id, k, t) =>
        id -> rs.filter(r => r._1 == k && r._2 >= t && r._2 - t <= tol)
          .sortBy(_._2).headOption.map(_._3)
      }.toMap
      assert(gotFT == expectFT, s"forward+tol seed=$seed")
    }
  }

  test("rangeJoin matches an in-memory brute force on random intervals") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val w = 50L
      val ps = (1 to 80).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      val is = (1 to 30).map { i =>
        val s = rnd.nextInt(1000).toLong
        (100L + i, s, s + 1 + rnd.nextInt(w.toInt - 1)) // 1 <= len <= w
      }
      val got = Temporal.rangeJoin(ps.toDF("pid", "t"), is.toDF("iid", "s", "e"),
          "t", "s", "e", chunkWidth = w)
        .select($"iid", $"pid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        (pid, t) <- ps; (iid, s, e) <- is if t >= s && t < e
      } yield (iid, pid)).toSet
      assert(got == expect, s"seed=$seed")
    }
  }
}
