package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dissection harness for the current hot query (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()

    def time(name: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("decontam_hits") {
      graft.SparkEntry.queries("decontam_hits")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("decontam_corpus") {
      graft.SparkEntry.queries("decontam_corpus")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
