package graft

import org.apache.spark.sql.SparkSession

/** Local smoke harness mirroring the driver's t1 check: SparkEntry.entry
  * on sf0.001 must return rows. Prints the count and the formatted plan.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY ROWS: " + df.count())
    df.explain("formatted")
    spark.stop()
  }
}
