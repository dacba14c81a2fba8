package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the minhash pipeline. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup count")(docs.count())
    time("shingles only")(docs.select(explode(Dedup.charShingles(col("text"), 5))).count())
    val sig = time("signatures (explode + 128 min-agg)") {
      val s = Dedup.minhashSignatures(docs, "doc_id", Dedup.charShingles(col("text"), 5), 128)
      s.write.format("noop").mode("overwrite").save(); s
    }
    time("full pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text", 5, 128, 16, 0.8)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
