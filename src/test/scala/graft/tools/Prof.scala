package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (test scope only): times declared queries by name
  * at the driver bench's config and action (noop-sink write), N repetitions
  * each. Usage: `Test/runMain graft.tools.Prof q1_agg lang_id ...`
  * (no args = the round's current hot list).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("lang_id", "text_quality", "stream_interval_join",
        "dedup_components", "stream_window_counts", "m7_profile")

    // same untimed warmup as Bench
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"PROF $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
