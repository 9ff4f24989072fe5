package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (test scope only): times the streaming
  * windowed-count sub-stages at the driver bench's config.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"PROF $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    def run(): Long = graft.streaming.Incremental.windowedCountsAppend(
      spark, s"$dir/lineitem.parquet", "l_shipdate", "l_returnflag", "l_quantity",
      windowSec = 30L * 86400, watermarkSec = 30L * 86400).count()

    time("run1_cold_staged") { run() }
    time("run2_warm_staged") { run() }
    time("run3_warm_staged") { run() }
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("run4_shufpart_4") { run() }
    time("run5_shufpart_4") { run() }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
