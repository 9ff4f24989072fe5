package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for headline queries (the
  * explain-and-iterate loop; observations recorded in PLANS.md).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    // --executed: run the query first, then print the FINAL adaptive plan
    // (AQE stage reuse — ReusedExchange/ReusedShuffle — only shows after
    // execution; the static formatted plan hides it)
    val executed = args.contains("--executed")
    val names0 = args.toSeq.filterNot(_ == "--executed")
    val names = if (names0.nonEmpty) names0
      else Seq("q1_agg", "q3_join_topk", "s2_window_extract", "dedup_minhash_lsh", "knn_bruteforce")
    names.foreach { n =>
      println(s"\n===== PLAN $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      if (executed) {
        // collect through THE SAME QueryExecution — a noop write builds
        // its own, leaving df.queryExecution at isFinalPlan=false
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
