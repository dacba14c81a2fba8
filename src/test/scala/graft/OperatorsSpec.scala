package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}

import graft.operators._
import graft.operators.Grouping.Leg

/** Per-operator e2e tests mirroring the reference's api_test.clj
  * (inline inputs, unordered multiset assertions). */
class TransformsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  import Transforms._

  test("mapElements 1→1 (api_test.clj:327-341)") {
    assert(Seq(1, 2, 3).toDS.mapElements(_ * 10).collect().toSet == Set(10, 20, 30))
  }

  test("mapKv + withKeys (api_test.clj:382-397, 437-449)") {
    val kv = Seq("aa", "b").toDS.mapKv(s => (s.length, s)).collect().toSet
    assert(kv == Set((2, "aa"), (1, "b")))
    val wk = Seq("aa", "b").toDS.withKeys(_.length).collect().toSet
    assert(wk == Set((2, "aa"), (1, "b")))
  }

  test("mapcat flattens (api_test.clj:399-410)") {
    assert(Seq(1, 3).toDS.mapcat(x => Seq(x, x + 1)).collect().toSet == Set(1, 2, 3, 4))
  }

  test("filter keeps original element (api_test.clj:412-419)") {
    assert(Seq(1, 2, 3, 4).toDS.filterElements(_ % 2 == 0).collect().toSet == Set(2, 4))
  }

  test("keep drops only nil, keeps falsy (api_test.clj:421-435)") {
    // reference: (keep #(when (even? %) (zero? %))) over 0..5 → [true false false]
    val out = Seq(0, 1, 2, 3, 4, 5).toDS
      .keep(x => if (x % 2 == 0) Some(x == 0) else None).collect().toSeq
    assert(out.sorted == Seq(false, false, true))
  }

  test("pardo per-partition with setup prologue (core.clj:602-610)") {
    val out = Seq(1, 2, 3).toDS.pardo { it =>
      val base = 100 // once-per-partition setup (initialize-fn analog)
      it.map(_ + base)
    }.collect().toSet
    assert(out == Set(101, 102, 103))
  }

  test("columnar keepExpr drops nulls") {
    val df = Seq(("a", 1), ("b", 2)).toDF("s", "n")
    val out = Transforms.keepExpr(df, when($"n" > 1, $"s"), "kept").collect().toSeq
    assert(out == Seq(Row("b")))
  }
}

class CombinersSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("combineFn contract: mean via (sum,count) buffer (core.clj:2004-2017)") {
    val mean = Combiners.meanFn[Double](identity)
    val out = Seq(1.0, 2.0, 6.0).toDS.select(mean.toColumn).head()
    assert(out == 3.0)
    assert(mean.finish(mean.zero) == 0.0) // empty input → 0.0 like the reference
  }

  test("countFn with predicate and weight (core.clj:1982-1990)") {
    val c = Combiners.countFn[Int](pred = _ % 2 == 0)
    assert(Seq(1, 2, 3, 4).toDS.select(c.toColumn).head() == 2L)
  }

  test("min/max nil-safe on empty (core.clj:2019-2050)") {
    val mx = Combiners.maxFn[Double](identity)
    assert(mx.finish(mx.zero).isEmpty)
    assert(Seq(1.0, 5.0, 2.0).toDS.select(mx.toColumn).head().contains(5.0))
  }

  test("reduceFn bare-fn sugar (core.clj:855-862)") {
    val sum = Combiners.reduceFn[Int](_ + _, 0)
    assert(Seq(1, 2, 3).toDS.select(sum.toColumn).head() == 6)
  }

  test("frequenciesFn map accumulator (core.clj:2052-2063)") {
    val f = Combiners.frequenciesFn[String, String](identity)
    val out = Seq("a", "b", "a").toDS.select(f.toColumn).head()
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("combiner merge law: associative+commutative ⇒ partial agg safe") {
    val m = Combiners.meanFn[Double](identity)
    // counts merge exactly; double sums are commutative exactly but
    // associative only up to fp reassociation error (Spark's partial
    // aggregation tolerates exactly this) — compare sums with a
    // relative tolerance, everything else exactly
    def close(p: (Double, Long), q: (Double, Long)): Boolean =
      p._2 == q._2 &&
        (p._1 == q._1 ||
          math.abs(p._1 - q._1) <= 1e-12 * math.max(math.abs(p._1), math.abs(q._1)))
    val prop = Prop.forAll { (a: (Double, Int), b: (Double, Int), c: (Double, Int)) =>
      val x = (a._1, a._2.toLong.abs); val y = (b._1, b._2.toLong.abs)
      val z = (c._1, c._2.toLong.abs)
      m.merge(x, y) == m.merge(y, x) &&
        close(m.merge(m.merge(x, y), z), m.merge(x, m.merge(y, z)))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("extremum merge laws (partial-agg safety for min/max)") {
    val mx = Combiners.maxFn[Double](identity)
    val prop = Prop.forAll { (xs: List[Double], ys: List[Double]) =>
      val a = xs.foldLeft(mx.zero)(mx.reduce)
      val b = ys.foldLeft(mx.zero)(mx.reduce)
      mx.merge(a, b) == mx.merge(b, a) &&
        mx.finish(mx.merge(a, b)) == (xs ++ ys).foldLeft(mx.zero)(mx.reduce)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("topK combiner: bounded buffer, matches windowed rank") {
    val data = (1 to 100).map(i => (i % 3, i.toDouble))
    val topAgg = Combiners.topKFn[(Int, Double), Double](3, _._2)
    val viaAgg = data.toDS.groupByKey(_._1).agg(topAgg.toColumn)
      .collect().map { case (k, vs) => k -> vs.toList }.toMap
    val viaWindow = Combiners.topKPerKey(data.toDF("k", "v"), Seq("k"), Seq($"v".desc), 3)
      .collect().groupBy(_.getInt(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted.reverse.toList }
    assert(viaAgg == viaWindow)
    assert(viaAgg(0) == List(99.0, 96.0, 93.0))
  }

  test("approximate aggregates (Spark superset; reference has none, SURVEY §2.4)") {
    val df = (1 to 10000).map(i => i % 1000).toDF("v")
    val approx = df.agg(approx_count_distinct($"v")).head().getLong(0)
    assert(math.abs(approx - 1000) < 100) // default 5% rsd
    val p50 = df.agg(percentile_approx($"v", lit(0.5), lit(1000))).head().getInt(0)
    assert(math.abs(p50 - 500) < 50)
  }

  test("juxt = one-pass multi-agg (core.clj:864-897)") {
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val r = Combiners.juxt(df, sum($"v"), avg($"v"), count(lit(1))).head()
    assert(r == Row(6.0, 2.0, 3L))
  }
}

class GroupingSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // keyVal fixture shape (api_test.clj:546-681): overlapping + nil keys
  def tblA = Seq((Some("a"), 1L), (Some("a"), 2L), (Some("b"), 3L), (None, 4L))
    .toDF("k", "va")
  def tblB = Seq((Some("a"), 10L), (Some("c"), 30L), (None, 40L))
    .toDF("k", "vb")

  test("joinBy all-required = inner (api_test.clj:655-669)") {
    val j = Grouping.joinBy(Seq(
      Leg(tblA, "k", required = true), Leg(tblB, "k", required = true)), "key")
    val got = j.select($"key", $"va", $"vb").collect().toSet
    assert(got == Set(Row("a", 1L, 10L), Row("a", 2L, 10L)))
  }

  test("joinBy one-required = outer toward it; nil keys don't join (core.clj:1618-1632)") {
    val j = Grouping.joinBy(Seq(
      Leg(tblA, "k", required = true), Leg(tblB, "k")), "key")
    val got = j.select($"key", $"va", $"vb").collect().toSet
    // all of A kept (incl. its nil-key row, alone); B's nil + 'c' dropped
    assert(got == Set(
      Row("a", 1L, 10L), Row("a", 2L, 10L), Row("b", 3L, null), Row(null, 4L, null)))
  }

  test("joinBy none-required = full outer") {
    val j = Grouping.joinBy(Seq(Leg(tblA, "k"), Leg(tblB, "k")), "key")
    assert(j.count() == 6) // a:2 + b:1 + c:1 + nilA:1 + nilB:1
    val nils = j.where($"key".isNull).count()
    assert(nils == 2) // each nil-key element its own row, not joined
  }

  test("joinBy dropNil pre-filters nil keys (core.clj:1588-1595)") {
    val j = Grouping.joinBy(Seq(
      Leg(tblA, "k", dropNil = true), Leg(tblB, "k", dropNil = true)), "key")
    assert(j.where($"key".isNull).count() == 0)
  }

  test("joinBy joinNil groups nil keys together (core.clj join-nil?)") {
    val j = Grouping.joinBy(Seq(Leg(tblA, "k"), Leg(tblB, "k")), "key", joinNil = true)
    val nilRows = j.where($"key".isNull).select($"va", $"vb").collect().toSet
    assert(nilRows == Set(Row(4L, 40L)))
  }

  test("cogroupBy shapes + required (api_test.clj:560-653)") {
    val cg = Grouping.cogroupBy(Seq(
      (Leg(tblA, "k"), "as"), (Leg(tblB, "k"), "bs")), "key")
    val byKey = cg.collect().map(r => Option(r.getString(0)) ->
      (r.getSeq[Row](1).size, r.getSeq[Row](2).size)).toMap
    assert(byKey(Some("a")) == (2, 1))
    assert(byKey(Some("b")) == (1, 0))
    assert(byKey(Some("c")) == (0, 1))
    // nil-keyed elements each form a singleton group
    val nilGroups = cg.collect().filter(r => r.isNullAt(0))
    assert(nilGroups.length == 2)
    val req = Grouping.cogroupBy(Seq(
      (Leg(tblA, "k", required = true), "as"), (Leg(tblB, "k", required = true), "bs")), "key")
    assert(req.select($"key").collect().map(_.getString(0)).toSet == Set("a"))
  }

  test("cogroupBy N-way at reference arity (101 inputs, api_test.clj:577-601)") {
    // validates the chained full-outer-join plan is analyzable and
    // correct at the reference's max tested arity, in bounded time
    val arity = 101
    val legs = (0 until arity).map { i =>
      (Grouping.Leg(Seq(("k", i.toLong)).toDF("k", s"v$i"), "k"), s"t$i")
    }
    val t0 = System.nanoTime()
    val cg = Grouping.cogroupBy(legs, "key")
    assert(cg.count() == 1)
    val row = cg.head()
    (1 to arity).foreach(i => assert(row.getSeq[org.apache.spark.sql.Row](i).size == 1))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 300.0, s"101-leg cogroup took ${secs}s")
  }

  test("cogroupBy dropNil and joinNil variants (core.clj:1588-1595, join-nil?)") {
    // dropNil on A only: A's nil row vanishes, B's nil row stays a
    // singleton group
    val dn = Grouping.cogroupBy(Seq(
      (Grouping.Leg(tblA, "k", dropNil = true), "as"), (Grouping.Leg(tblB, "k"), "bs")), "key")
    val nilRows = dn.where($"key".isNull).collect()
    assert(nilRows.length == 1)
    assert(nilRows.head.getSeq[Row](1).isEmpty && nilRows.head.getSeq[Row](2).size == 1)
    // joinNil: all nil-keyed elements group together across legs
    val jn = Grouping.cogroupBy(Seq(
      (Grouping.Leg(tblA, "k"), "as"), (Grouping.Leg(tblB, "k"), "bs")), "key", joinNil = true)
    val nilJoined = jn.where($"key".isNull).collect()
    assert(nilJoined.length == 1)
    assert(nilJoined.head.getSeq[Row](1).size == 1 && nilJoined.head.getSeq[Row](2).size == 1)
  }

  test("cogroupAgg: aggregate-form cogroup, no list materialization") {
    val cg = Grouping.cogroupAgg(Seq(
      (Grouping.Leg(tblA, "k"), Seq((count(lit(1)), "n_a"), (sum($"va"), "s_a"))),
      (Grouping.Leg(tblB, "k"), Seq((count(lit(1)), "n_b")))), "key")
    val m = cg.where($"key".isNotNull).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("a") == (2L, 3L, 1L))
    assert(m("b") == (1L, 3L, 0L))
    assert(m("c") == (0L, 0L, 1L))
    val req = Grouping.cogroupAgg(Seq(
      (Grouping.Leg(tblA, "k", required = true), Seq((count(lit(1)), "n_a"))),
      (Grouping.Leg(tblB, "k", required = true), Seq((count(lit(1)), "n_b")))), "key")
    assert(req.select($"key").collect().map(_.getString(0)).toSet == Set("a"))
  }

  test("sorted-iterator grouping streams groups in order (huge-key variants)") {
    val ds = Seq(("a", 3), ("a", 1), ("b", 2), ("a", 2)).toDS
    val grouped = Grouping.groupByKeySorted(ds, (x: (String, Int)) => x._1, $"_2") {
      (k, it) => Iterator((k, it.map(_._2).mkString(",")))
    }.collect().toMap
    assert(grouped == Map("a" -> "1,2,3", "b" -> "2"))
    val a = Seq(("a", 2), ("a", 1)).toDS
    val b = Seq(("a", 9), ("b", 8)).toDS
    val cg = Grouping.cogroupTypedSorted(a, (x: (String, Int)) => x._1, Seq($"_2"),
        b, (x: (String, Int)) => x._1, Seq($"_2")) {
      (k, as, bs) => Iterator((k, as.map(_._2).mkString(","), bs.map(_._2).mkString(",")))
    }.collect().toSet
    assert(cg == Set(("a", "1,2", "9"), ("b", "", "8")))
  }

  test("cogroupTyped 2-way (core.clj 2-input cogroup)") {
    val a = Seq(("a", 1), ("b", 2)).toDS
    val b = Seq(("a", 10)).toDS
    val out = Grouping.cogroupTyped(a, (x: (String, Int)) => x._1, b, (x: (String, Int)) => x._1) {
      (k, as, bs) => Iterator((k, as.size, bs.size))
    }.collect().toSet
    assert(out == Set(("a", 1, 1), ("b", 1, 0)))
  }

  test("distinct / distinctBy arbitrary survivor (api_test.clj:683-704)") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    assert(Grouping.distinctRows(df.select("k")).count() == 2)
    val db = Grouping.distinctBy(df, Seq("k")).collect()
    assert(db.map(_.getInt(0)).toSet == Set(1, 2)) // key set exact
    assert(db.forall(r => Set("x", "y", "z").contains(r.getString(1)))) // member of input
    val dbf = Grouping.distinctByFirst(df, Seq("k"), Seq($"v"))
    assert(dbf.collect().map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "x"), (2, "z")))
  }

  test("sample three scopes (core.clj:1758-1782)") {
    val df = (1 to 100).toDF("n")
    assert(Grouping.sampleAny(df, 7).count() == 7)
    assert(Grouping.sampleGlobal(df, 7).count() == 7)
    val keyed = (1 to 100).map(i => (i % 4, i)).toDF("k", "n")
    val per = Grouping.samplePerKey(keyed, Seq("k"), 3)
    assert(per.groupBy("k").count().collect().forall(_.getLong(1) == 3))
  }

  test("sampleByHash: deterministic across partitioning, seed-sensitive") {
    val df = (1 to 100).toDF("n")
    val a = Grouping.sampleByHash(df, "n", 10).collect().map(_.getInt(0)).toSeq
    assert(a.length == 10 && a.distinct.length == 10)
    // same rows in the same order regardless of physical partitioning
    val b = Grouping.sampleByHash(df.repartition(13), "n", 10).collect().map(_.getInt(0)).toSeq
    assert(a == b)
    // a different seed draws a different sample (md5 salt moves everything)
    val c = Grouping.sampleByHash(df, "n", 10, seed = 7L).collect().map(_.getInt(0)).toSeq
    assert(a != c)
  }

  test("samplePerKeyByHash: repartition-invariant, seed-sensitive, n per key") {
    val keyed = (1 to 100).map(i => (i % 4, i)).toDF("k", "n")
    def draw(df: org.apache.spark.sql.DataFrame, seed: Long = 42L) =
      Grouping.samplePerKeyByHash(df, Seq("k"), "n", 3, seed)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    val a = draw(keyed)
    assert(a.length == 12 && a.groupBy(_._1).forall(_._2.length == 3))
    // unlike samplePerKey's rand(seed) ordering, the drawn rows do not
    // depend on physical partitioning
    assert(draw(keyed.repartition(13)) == a)
    assert(draw(keyed, seed = 7L) != a)
  }

  test("concat keeps duplicates; set ops distinct (core.clj:1799-1861)") {
    val a = Seq(1, 2, 2).toDF("n"); val b = Seq(2, 3).toDF("n")
    assert(Grouping.concat(Seq(a, b)).count() == 5)
    assert(Grouping.unionDistinct(Seq(a, b)).collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    assert(Grouping.intersectDistinct(a, b).collect().map(_.getInt(0)).toSet == Set(2))
    assert(Grouping.exceptDistinct(a, Seq(b)).collect().map(_.getInt(0)).toSet == Set(1))
  }

  test("saltedJoin matches plain join results (skew recipe)") {
    val skewed = (1 to 1000).map(i => ("hot", i)) ++ Seq(("cold", 1), ("cold", 2))
    val left = skewed.toDF("k", "v")
    val right = Seq(("hot", 10), ("cold", 20), ("unmatched", 30)).toDF("k", "w")
    val plain = left.join(right, Seq("k"), "left")
      .collect().map(r => (r.getString(0), r.getInt(1), Option(r.get(2)))).toSet
    val salted = Grouping.saltedJoin(left, right, Seq("k"), salt = 8, joinType = "left")
      .collect().map(r => (r.getString(0), r.getInt(1), Option(r.get(2)))).toSet
    assert(salted == plain)
    val inner = Grouping.saltedJoin(left, right, Seq("k"), 8).count()
    assert(inner == left.join(right, Seq("k")).count())
    intercept[IllegalArgumentException](Grouping.saltedJoin(left, right, Seq("k"), 8, "full"))
  }

  test("bloomSemiJoin/bloomAntiJoin: exact join semantics at any fpp, codegen probe, nulls") {
    val rnd = new scala.util.Random(41)
    val big = (1 to 400).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(9))) ++
      Seq((0L, -1)) // and a null key below
    val bigDf = big.toDF("k", "v").union(
      Seq((0L, -2)).toDF("k", "v")
        .select(lit(null).cast("long").as("k"), col("v")))
    val keys = (0 to 119 by 3).map(i => Tuple1(i.toLong))
    val keysDf = keys.toDF("gk").union(
      Seq(Tuple1(0L)).toDF("gk").select(lit(null).cast("long").as("gk")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.get(0)), r.getInt(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val plainSemi = rows(bigDf.join(keysDf,
      bigDf("k") === keysDf("gk"), "left_semi"))
    val plainAnti = rows(bigDf.join(keysDf,
      bigDf("k") === keysDf("gk"), "left_anti"))
    // a sky-high fpp floods the exact stage with false positives and
    // the output must not move; fpp 0.5 exercises the probe pruning too
    for (fpp <- Seq(0.5, 0.9)) {
      val semi = Grouping.bloomSemiJoin(bigDf, col("k"), keysDf, col("gk"),
        fpp = fpp)
      val anti = Grouping.bloomAntiJoin(bigDf, col("k"), keysDf, col("gk"),
        fpp = fpp)
      assert(rows(semi) == plainSemi, s"semi fpp=$fpp")
      assert(rows(anti) == plainAnti, s"anti fpp=$fpp")
      // the NULL-key row dies in semi, survives anti (equality semantics)
      assert(!rows(semi).keySet.exists(_._1.isEmpty))
      assert(rows(anti).keySet.exists(_._1.isEmpty))
    }
    // the probe is the codegen'd catalyst expression, visible in the
    // plan on a non-foldable (file) input — over a local relation
    // ConvertToLocalRelation evaluates the filter at optimize time
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"))
    val planSemi = Grouping.bloomSemiJoin(li, col("l_orderkey"), ords,
      col("o_orderkey"))
    assert(planSemi.queryExecution.executedPlan.toString
      .contains("might_contain"), "bloom probe missing from plan")
    assert(planSemi.count() ==
      li.join(ords, li("l_orderkey") === ords("o_orderkey"), "left_semi")
        .count())
    // sized form matches; degenerate expectedItems rejected
    assert(rows(Grouping.bloomSemiJoin(bigDf, col("k"), keysDf, col("gk"),
      expectedItems = 64L)) == plainSemi)
    intercept[IllegalArgumentException](Grouping.bloomSemiJoin(
      bigDf, col("k"), keysDf, col("gk"), expectedItems = 0L))
    intercept[IllegalArgumentException](Grouping.bloomSemiJoin(
      bigDf, col("k"), keysDf, col("gk"), fpp = 1.0))
  }

  test("groupByKey collects values (core.clj:926-935)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val g = Grouping.groupByKey(df, "k")
    val m = g.collect().map(r => r.getString(0) -> r.getSeq[Row](1).map(_.getInt(0)).toSet).toMap
    assert(m == Map("a" -> Set(1, 2), "b" -> Set(3)))
  }
}

class SideArtifactsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("view shapes (core.clj:789-808)") {
    val df = Seq(("a", 1), ("b", 2), ("b", 3)).toDF("k", "v")
    assert(SideArtifacts.viewList(df).size == 3)
    assert(SideArtifacts.viewMap(df.dropDuplicates("k"), "k", "v").keySet == Set("a", "b"))
    assert(SideArtifacts.viewMultiMap(df, "k", "v")("b").toSet == Set(2, 3))
    assert(SideArtifacts.viewSingleton(df.where($"k" === "a")) == Row("a", 1))
  }

  test("sideOutputs tag routing (core.clj:302-360)") {
    val df = Seq(1, 2, 3, 4).toDF("n")
    val outs = SideArtifacts.sideOutputs(df, when($"n" % 2 === 0, "even").otherwise("odd"),
      Seq("even", "odd"))
    assert(outs("even").collect().map(_.getInt(0)).toSet == Set(2, 4))
    assert(outs("odd").collect().map(_.getInt(0)).toSet == Set(1, 3))
  }

  test("partitionInto N-way split (core.clj:831-853)") {
    val parts = SideArtifacts.partitionInto(Seq(1, 2, 3, 4, 5).toDF("n"), 2, $"n" % 2)
    assert(parts(0).collect().map(_.getInt(0)).toSet == Set(2, 4))
    assert(parts(1).collect().map(_.getInt(0)).toSet == Set(1, 3, 5))
  }
}
