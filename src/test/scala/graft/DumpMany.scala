package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: dump a comma-separated list of declared queries to parquet
  * in one JVM (the [[DumpOne]] loop without 150 JVM startups) —
  * `sbt "Test/runMain graft.DumpMany <names,…|@file> <sfDir> <outDir>"`.
  * Failures are loud per query (stderr) but don't stop the sweep; each
  * failed query gets an `_ERROR.json`, the Verify convention.
  */
object DumpMany {
  def main(args: Array[String]): Unit = {
    val Array(namesArg, dir, out) = args
    val names: Seq[String] =
      if (namesArg.startsWith("@")) {
        val src = scala.io.Source.fromFile(namesArg.drop(1))
        try src.getLines().map(_.trim).filter(_.nonEmpty).toList
        finally src.close()
      } else namesArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      try {
        SparkEntry.queries(name)(spark, dir)
          .coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
        System.err.println(s"[dumpmany] $name OK")
      } catch { case e: Throwable =>
        System.err.println(s"[dumpmany] $name FAILED: ${e.getMessage}")
        val d = new java.io.File(s"$out/$name")
        d.mkdirs()
        val msg = e.toString.flatMap {
          case '\\' => "\\\\"
          case '"' => "\\\""
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/$name/_ERROR.json"),
          s"""{"query": "$name", "error": "$msg"}""")
      }
    }
    spark.stop()
  }
}
