package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev A/B: run declared queries under extra session confs.
  * Usage: Test/runMain graft.tools.Scratch2 [k=v ...] -- <query> [<query>...]
  */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val (confs, rest) = args.span(_ != "--")
    val names = rest.drop(1)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()
    val tag = if (confs.isEmpty) "base" else confs.mkString(",")
    var total = 0.0
    names.foreach { name =>
      var best = Double.MaxValue
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"SCRATCH2 [$tag] $name%-30s run$i $dt%7.2f s")
      }
      total += best
    }
    println(f"SCRATCH2 [$tag] TOTAL-MIN $total%8.2f s over ${names.length} queries")
    spark.stop()
  }
}
