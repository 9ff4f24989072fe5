package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: Bench-style noop-sink timing of ONE declared query —
  * `sbt "Test/runMain graft.TimeOne <name> [sfDir] [cpus]"`.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup, as in Bench
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name sample$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
