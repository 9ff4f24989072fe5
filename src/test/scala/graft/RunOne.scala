package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: run ONE declared query against a test-data dir and print it —
  * `sbt "Test/runMain graft.RunOne <name> [sfDir]"`. Keeps the
  * edit-verify loop on a single query at seconds, not a full Verify sweep.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.show(50, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
