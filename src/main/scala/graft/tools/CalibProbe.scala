package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: measure the Bench calibration query (the fixed
  * data-independent `sum(xxhash64(id))` over a 1.5e9-row range) a few
  * times on THIS box, to (re)establish the clean-box reference used by
  * README's "Bench noise" decision rule. Run on an idle machine. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg1m(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      // MUST stay textually in sync with Bench.calibrate()
      spark.range(0L, 6000000000L, 1L, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id)) AS h")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val n = if (args.nonEmpty) args(0).toInt else 5
    println(s"loadavg(1m)=${loadAvg1m()}")
    val times = (1 to n).map { i =>
      val t = calibrate(); println(f"calib[$i] = $t%.3f s"); t
    }
    println(f"min=${times.min}%.3f median=${times.sorted.apply(n / 2)}%.3f " +
      f"loadavg_end=${loadAvg1m()}")
    spark.stop()
  }
}
