package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical scaling probe (`runMain graft.tools.ScaleProbe <sfDir>
  * <q1,q2,…>`): runs each named SparkEntry query twice (cold then warm —
  * cold includes fixture/index builds, the maintained-index "end-to-end
  * ingest" leg) with the bench's noop-sink action, recording per-run
  * seconds and the DRIVER JVM heap peak (memory-pool peaks reset before
  * each query). One JSON line per query + a trailing summary line — run
  * it on sf0.1 and on a [[ScaleUp]] corpus and compare the ratios.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    def heapPeakMb: Long =
      heapPools.map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      heapPools.foreach(_.resetPeakUsage())
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run()
      val warm = run()
      val peak = heapPeakMb
      println(f"""[scaleprobe] {"query":"$name","cold_sec":$cold%.2f,"warm_sec":$warm%.2f,"driver_heap_peak_mb":$peak}""")
      (name, cold, warm, peak)
    }
    val qjson = results.map { case (n, c, w, p) =>
      f""""$n":{"cold_sec":$c%.2f,"warm_sec":$w%.2f,"driver_heap_peak_mb":$p}"""
    }.mkString(",")
    println(s"""[scaleprobe-summary] {"sf_dir":"$sfDir","queries":{$qjson}}""")
    spark.stop()
  }
}
