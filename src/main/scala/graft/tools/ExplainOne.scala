package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump: `runMain graft.tools.ExplainOne <name> [sfDir]` prints
  * the formatted physical plan of one SparkEntry query (sf0.001 default —
  * plan shape, not data).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"===== $name =====")
    df.explain("formatted")
    spark.stop()
  }
}
