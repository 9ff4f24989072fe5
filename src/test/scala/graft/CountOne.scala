package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: COUNT one declared query against a test-data dir —
  * `sbt "Test/runMain graft.CountOne <name> [sfDir] [cpus]"`. The count
  * aggregate lets Catalyst's EliminateSorts drop the declared query's
  * final orderBy, so output-bound queries whose sorted materialization
  * exceeds local disk (the fuzzy-linkage id fan-out at ×100) can still
  * be value-checked by cardinality at scale.
  */
object CountOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    println(f"[countone] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
