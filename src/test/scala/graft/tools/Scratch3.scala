package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev: measure session-aging — time watch queries fresh, run N primers,
  * time watch queries again. Test/runMain graft.tools.Scratch3 <nPrimers> <watch...>
  */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val watch = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()
    def time(name: String, tag: String): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"SCRATCH3 [$tag] $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"persisted=${spark.sparkContext.getPersistentRDDs.size}")
    }
    watch.foreach(time(_, "fresh"))
    val primers = graft.SparkEntry.queries.keys.toSeq.sorted.take(n)
    primers.zipWithIndex.foreach { case (name, i) =>
      try graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"SCRATCH3 primer $name failed: ${e.getMessage.take(80)}") }
      if ((i + 1) % 20 == 0) println(s"SCRATCH3 primed ${i + 1}")
    }
    watch.foreach(time(_, "aged"))
    spark.stop()
  }
}
