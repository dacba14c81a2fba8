package graft.tools
import org.apache.spark.sql.SparkSession
object TriExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq((1L,2L),(2L,3L),(1L,3L),(3L,4L)).toDF("u","v")
    val df = graft.functions.Corpus.triangleCountsIntersect(edges, $"u", $"v")
    df.collect()
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join"))
      .foreach(println)
    spark.stop()
  }
}
