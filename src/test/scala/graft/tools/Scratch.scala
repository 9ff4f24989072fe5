package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dissection harness for the current hot query (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    graft.SparkEntry.queries("source_mix")(spark, dir).collect().foreach { r =>
      println(s"SCRATCH source_mix ('${r.getString(0)}', ${r.getLong(1)})")
    }
    graft.SparkEntry.queries("pack_chunks")(spark, dir).show(5)
    graft.SparkEntry.queries("text_scrub")(spark, dir).show(2, 200)
    spark.stop()
  }
}
