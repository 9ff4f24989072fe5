package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev: decompose m8's single-aggregate cost (exact percentile vs GK). */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.count()
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val probes = ps.flatMap(p => Seq(p - 0.01, p, p + 0.01))
    def time(tag: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"SCRATCH4 $tag run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("exact12x4") {
      li.agg(
        call_function("percentile", col(cols(0)), array(probes.map(lit): _*)),
        call_function("percentile", col(cols(1)), array(probes.map(lit): _*)),
        call_function("percentile", col(cols(2)), array(probes.map(lit): _*)),
        call_function("percentile", col(cols(3)), array(probes.map(lit): _*))).collect()
    }
    time("gk200x4") {
      li.agg(
        percentile_approx(col(cols(0)), array(ps.map(lit): _*), lit(200)),
        percentile_approx(col(cols(1)), array(ps.map(lit): _*), lit(200)),
        percentile_approx(col(cols(2)), array(ps.map(lit): _*), lit(200)),
        percentile_approx(col(cols(3)), array(ps.map(lit): _*), lit(200))).collect()
    }
    time("sort1col") {
      val n = li.select(col("l_extendedprice").cast("double").as("v")).na.drop
        .sort("v").rdd.zipWithIndex().filter(_._2 % 100000 == 0).collect()
    }
    spark.stop()
  }
}
