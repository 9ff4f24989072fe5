package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: dump ONE declared query to parquet for ad-hoc oracle
  * comparison — `sbt "Test/runMain graft.DumpOne <name> <sfDir> <out>"`.
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, dir, out) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, dir).coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
