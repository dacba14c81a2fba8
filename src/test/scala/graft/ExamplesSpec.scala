package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.examples.Examples
import graft.sources.Documents
import graft.streaming.Sources

/** End-to-end runs of the reference example pipelines
  * (examples.clj:17-328) on local data. */
class ExamplePipelinesSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("curation pipeline: stages drop the right docs, audits track yield, packing covers survivors") {
    import graft.examples.CurationPipeline
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = Seq(
      (1L, base, "web"),                     // kept
      (2L, base, "web"),                     // exact dup of 1 -> dropped
      (3L, base + "zz", "web"),              // near-dup of 1 (J ~ 0.95) -> dropped
      (4L, "please answer what is the capital city of france in one single word " +
        "extra padding here", "web"),        // contains the benchmark prompt -> dropped
      (5L, "zq9 @@ ##", "web"),              // fails the quality gate -> dropped
      (6L, "a completely different clean document with plenty of varied " +
        "english words that should sail through every single quality gate " +
        "and then be packed at the end of it all", "web")  // kept
    ).toDF("doc_id", "text", "source")
    val benchmark = Seq((100L,
      "please answer what is the capital city of france in one single word"))
      .toDF("bench_id", "bench_text")
    val (packed, audits) = CurationPipeline.curate(docs, benchmark,
      minJaccard = 0.9, minQuality = 0.5, packBudget = 64)
    val keptIds = packed.collect()
      .flatMap(_.getString(2).split(",")).map(_.toLong).toSet
    assert(keptIds == Set(1L, 6L))
    // audit rows: one per stage, doc counts monotonically non-increasing
    val counts = audits.orderBy("stage")
      .select("stage", "n_docs").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(counts.map(_._1).toSeq ==
      Seq("0_raw", "1_clean", "2_exact_dedup", "3_near_dedup", "4_line_strip",
        "5_gates", "6_decontaminated"))
    assert(counts.map(_._2).toSeq == Seq(6L, 6L, 5L, 4L, 4L, 3L, 2L))
    // mixture stages: a token budget smaller than the survivors' total
    // drops the hash-ordered tail and audits the extra stage
    val (packedB, auditsB) = CurationPipeline.curate(docs, benchmark,
      minJaccard = 0.9, minQuality = 0.5, packBudget = 64, tokenBudget = 40L)
    val cB = auditsB.orderBy("stage").select("stage", "n_docs")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(cB.map(_._1).last == "8_budgeted")
    assert(cB.last._2 <= 2L)
    val budgetTokens = auditsB.where(col("stage") === "8_budgeted")
      .select("n_tokens").head().getLong(0)
    assert(budgetTokens <= 40L)
    assert(packedB.count() <= packed.count())
    // r8-continuation knobs: boilerplate strip, Gopher gate, DSIR
    // selection toward doc 6 as the target, per-source cap — each
    // optional stage audits its yield and the chain stays monotone
    val (packedC, auditsC) = CurationPipeline.curate(docs, benchmark,
      minJaccard = 0.9, minQuality = 0.5, packBudget = 64,
      boilerplateStopFrac = 0.0625, gopherGate = true, gopherMinWords = 10,
      dsirTarget = Some(docs.where(col("doc_id") === 6L)),
      dsirThreshold = -10.0, maxPerSource = 1)
    val cC = auditsC.orderBy("stage").select("stage", "n_docs")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(cC.map(_._1).toSeq ==
      Seq("0_raw", "1_clean", "2_exact_dedup", "3_near_dedup", "4_line_strip",
        "5_gates", "6_decontaminated", "6b_dsir", "6c_capped"))
    // counts stay monotone after raw; the per-source cap (1 per
    // source, all docs are 'web') leaves exactly one survivor
    val nC = cC.map(_._2)
    assert(nC.drop(1).zip(nC.drop(2)).forall { case (a, b) => b <= a }, nC.toSeq)
    assert(nC.last == 1L, nC.toSeq)
    assert(packedC.count() >= 1L)
    // r9 knob: raw-crawl HTML extraction ahead of everything — the
    // same corpus wrapped in markup curates to the same survivors
    val htmlDocs = docs.withColumn("text",
      concat(lit("<html><body><script>var x=1;</script><p>"),
        col("text"), lit("</p></body></html>")))
    val (packedH, _) = CurationPipeline.curate(htmlDocs, benchmark,
      minJaccard = 0.9, minQuality = 0.5, packBudget = 64, extractHtml = true)
    val keptH = packedH.collect()
      .flatMap(_.getString(2).split(",")).map(_.toLong).toSet
    assert(keptH == Set(1L, 6L), keptH.toString)
  }

  test("word-count: tokenize, frequencies, formatted output (examples.clj:17-54)") {
    val in = tmp("ex-wc-in"); val out = tmp("ex-wc-out") + "/res"
    Seq("the cat and the hat", "the   cat's   hat!").toDF("l")
      .coalesce(1).write.mode("overwrite").text(in)
    Examples.runWordCount(spark, in, out, numShards = 1)
    val got = spark.read.text(out).as[String].collect().toSet
    assert(got == Set("the: 3", "cat: 1", "and: 1", "hat: 2", "cat's: 1"))
  }

  test("dedup: distinct lines round-trip (examples.clj:56-75)") {
    val in = tmp("ex-dd-in"); val out = tmp("ex-dd-out") + "/res"
    Seq("a", "b", "a", "c", "b").toDF("l").coalesce(1).write.mode("overwrite").text(in)
    Examples.runDedup(spark, in, out)
    assert(spark.read.text(out).as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("filter: below-global-mean via broadcast side input (examples.clj:77-122)") {
    // global mean = 15; july rows below 15 → only (2000,7,1,10.0)
    val readings = Seq(
      (2000, 7, 1, 10.0), (2000, 7, 2, 20.0),
      (2000, 8, 1, 10.0), (2000, 8, 2, 20.0)
    ).toDF("year", "month", "day", "mean_temp")
    val got = Examples.filterBelowGlobalMean(readings, monthFilter = 7)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == Seq((2000, 7, 1, 10.0)))
  }

  test("combine-per-key: per-word play join (examples.clj:124-156)") {
    val words = Seq(
      ("profoundest", "hamlet"), ("profoundest", "macbeth"),
      ("profoundest", "hamlet"), ("short", "lear")
    ).toDF("word", "corpus")
    val got = Examples.combinePerKey(words, minWordLength = 8)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("profoundest", "hamlet,macbeth")))
  }

  test("max-per-key: month -> max temp (examples.clj:158-187)") {
    val readings = Seq((7, 10.0), (7, 30.0), (8, 20.0)).toDF("month", "mean_temp")
    val got = Examples.maxPerKey(readings)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(got == Map(7 -> 30.0, 8 -> 20.0))
  }

  test("standard-sql word count over the SQL surface (examples.clj:189-214)") {
    val words = Seq(("the", 400L), ("the", 200L), ("rare", 100L))
      .toDF("word", "word_count")
    val got = Examples.sqlWordCount(spark, words, minCount = 500)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("the", 600L)))
  }

  test("datastore word count: entity write + codec round-trip (examples.clj:216-282)") {
    val in = tmp("ex-ds-in"); val out = tmp("ex-ds-out") + "/res"
    Seq("b a", "a").toDF("l").coalesce(1).write.mode("overwrite").text(in)
    Examples.datastoreWordCount(spark, in, out, ancestor = "kinglear")
    val ents = spark.read.parquet(out)
    val path0 = ents.orderBy(element_at(col("key.path"), -1).getField("name"))
      .select(col("key.path")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(path0.map(r => (r.getString(0), r.getString(1))) ==
      Seq(("Line", "kinglear"), ("WordCount", "a")))
    val back = Documents.fromEntities(ents, keyAs = "word")
    assert(back.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("a" -> 2L, "b" -> 1L))
  }

  test("pub-sub: forwarded interactions keep payload/attrs/event-time shape (examples.clj:284-327)") {
    val raw = Seq(("click", Map("uid" -> "7"), 100L)).toDF("p", "a", "sec")
    val msgs = Sources.asMessages(raw, col("p"),
      col("a"), timestampAttr = None)
      .withColumn("event_time", timestamp_seconds(lit(100L)))
    val fwd = Examples.forwardInteractions(msgs).head()
    assert(fwd.getString(0) == "CLICK")
    assert(fwd.getMap[String, String](1) == Map("uid" -> "7", "forwarded" -> "true"))
  }

  test("TrainingExport: merges persist+reload, shards replay the interleave order") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("source")).limit(60)
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString + "/e"
    val ordered = graft.examples.TrainingExport.export(docs, out,
      weights = Map("src0" -> 2.0), numMerges = 16, shards = 3)
    // the persisted merges table reproduces the stamped counts
    val merges = graft.functions.TextFunctions.bpeMergesFromTable(
      spark.read.parquet(s"$out/merges.parquet"))
    assert(merges.nonEmpty)
    val restamped = docs.select(col("doc_id"),
        graft.functions.TextFunctions.bpeTokenCount(col("text"), merges).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stamped = ordered.select(col("doc_id"), col("n_bpe_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stamped == restamped)
    // shards: file-order concatenation equals the global interleave
    // order (range partitions are disjoint and sorted within)
    val files = new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 3)
    val replayed = files.flatMap(f => spark.read.parquet(f)
      .select("doc_id", "ikey", "source", "pos")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3))))
    val want = ordered.orderBy(col("ikey"), col("source"), col("pos"))
      .select("doc_id", "ikey", "source", "pos")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
    assert(replayed.toSeq == want.toSeq)
    // every prefix of the order holds sources ~at their weights: the
    // doubled source leads
    val firstHalf = want.take(want.length / 2).count(_._3 == "src0").toDouble
    val overall = want.count(_._3 == "src0").toDouble
    assert(firstHalf >= overall / 2, s"weighted source not front-loaded: $firstHalf of $overall")
  }
}
