package graft.etl

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class FileLoadsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val ref = LocalDate.parse("2001-11-04")
  private def li = Tables.lineitem(spark, GraftSpark.Sf0001)

  test("L5 file-level: dynamic partition overwrite touches only incoming partitions; idempotent") {
    val path = Files.createTempDirectory("graft_fl").toString + "/t"
    FileLoads.overwriteAll(li, "l_shipdate", path)
    val before = spark.read.parquet(path).count()

    val window = li.filter(Windows.inWindow(col("l_shipdate"), ref, 30))
    val historyBefore = spark.read.parquet(path)
      .filter(col("p_date") < "2001-10-05").count()

    FileLoads.refreshWindow(spark, window, "l_shipdate", path)
    val after = spark.read.parquet(path)
    assert(after.count() == before) // same data: refresh replaced its own partitions
    assert(after.filter(col("p_date") < "2001-10-05").count() == historyBefore) // history untouched

    FileLoads.refreshWindow(spark, window, "l_shipdate", path) // re-run: no duplication
    assert(spark.read.parquet(path).count() == before)
  }

  test("partition pruning: date-window read scans only matching partitions") {
    val path = Files.createTempDirectory("graft_fl2").toString + "/t"
    FileLoads.overwriteAll(li, "l_shipdate", path)
    val df = FileLoads.readWindow(spark, path, "2001-10-05")
    val expected = li.filter(col("l_shipdate") >= lit("2001-10-05").cast("timestamp")).count()
    assert(df.count() == expected)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") || scan.contains("p_date"), "pruning should appear in the scan")
  }

  test("Pipeline composes lazily and notifies success count") {
    var notified = -1L
    val n = new graft.notify.Notifier {
      def success(p: String, records: Long): Unit = notified = records
      def failure(p: String, e: Throwable): Unit = ()
    }
    val out = Files.createTempDirectory("graft_pl").toString + "/out"
    val count = Pipeline(
      name = "li_window",
      extract = () => li,
      notifier = n)
      .transform(df => df.filter(Windows.inWindow(col("l_shipdate"), ref, 30)))
      .transform(Sanitize.sanitizeInf)
      .run(df => df.write.mode("overwrite").parquet(out))
    assert(count > 0 && notified == count)
    assert(spark.read.parquet(out).count() == count)
  }
}
