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

  test("l9 canary: the one-week read-back scan carries NON-EMPTY partitionFilters " +
      "(pruned at listing, not post-scan)") {
    val path = Files.createTempDirectory("graft_fl_l9").toString + "/events"
    val ev = Tables.events(spark, GraftSpark.Sf0001)
    FileLoads.append(ev, "ts", path)
    val df = spark.read.parquet(path)
      .filter(col("p_date") >= "2024-01-10" && col("p_date") < "2024-01-17")
      .groupBy(col("p_date").cast("string").as("p_date"))
      .agg(count(lit(1)).as("n_events"))
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in the plan")
    scans.foreach(f => assert(f.partitionFilters.nonEmpty,
      s"scan lists ALL partitions — prune lost:\n$f"))
    // and the pruned result is right
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.filter(date_format(col("ts"), "yyyy-MM-dd").between("2024-01-10", "2024-01-16"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
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

  test("erasePartitioned rewrites only affected partitions; fully-victim partitions vanish") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_erase").toString + "/t"
    // 3 days: d1 has victim 7 among others, d2 has NO victims, d3 is
    // ENTIRELY victim 9's rows (the dynamic-overwrite blind spot)
    val rows = Seq(
      (7L, "2024-01-01 01:00:00"), (1L, "2024-01-01 02:00:00"), (2L, "2024-01-01 03:00:00"),
      (3L, "2024-01-02 01:00:00"), (4L, "2024-01-02 02:00:00"),
      (9L, "2024-01-03 01:00:00"), (9L, "2024-01-03 02:00:00")
    ).toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    FileLoads.overwriteAll(rows, "ts", dir)
    val untouchedFiles = partFiles(dir).filter(_._1.contains("2024-01-02"))
    val ledger = FileLoads.erasePartitioned(spark, dir, "user_id",
        Seq(7L, 9L).toDF("k"))
      .orderBy("p_date").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ledger.toSeq == Seq(
      ("2024-01-01", 3L, 2L, 1L),
      ("2024-01-03", 2L, 0L, 2L)))
    val back = spark.read.parquet(dir)
    assert(back.count() == 4) // d1: 2 retained, d2: 2 untouched, d3: gone
    assert(back.filter(col("user_id").isin(7L, 9L)).isEmpty, "victims survived")
    assert(!new java.io.File(dir, "p_date=2024-01-03").exists,
      "fully-victim partition directory must be deleted")
    // d2 was never rewritten: same file listing
    assert(partFiles(dir).filter(_._1.contains("2024-01-02")) == untouchedFiles)
    // no victims anywhere → empty ledger, target untouched
    assert(FileLoads.erasePartitioned(spark, dir, "user_id",
      Seq(999L).toDF("k")).isEmpty)
    assert(spark.read.parquet(dir).count() == 4)
    intercept[IllegalArgumentException] {
      FileLoads.erasePartitioned(spark, dir, "user_id", rows)
    }
    // erase-EVERYTHING: every remaining row is a victim — all partition
    // dirs vanish and the ledger still reports n_after = 0 (a parquet
    // read of the now-empty target would fail schema inference)
    val wipe = FileLoads.erasePartitioned(spark, dir, "user_id",
        Seq(1L, 2L, 3L, 4L).toDF("k"))
      .orderBy("p_date").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(wipe.toSeq == Seq(
      ("2024-01-01", 2L, 0L, 2L),
      ("2024-01-02", 2L, 0L, 2L)))
    assert(!new java.io.File(dir, "p_date=2024-01-01").exists)
    assert(!new java.io.File(dir, "p_date=2024-01-02").exists)
  }

  test("compact merges small files per partition, preserves data, skips healthy partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val li = Tables.lineitem(spark, GraftSpark.Sf0001).limit(2000)
    // simulate small-file accretion: 10 appends of 200 rows each
    (0 until 10).foreach { i =>
      FileLoads.append(li.filter(col("l_orderkey") % 10 === i), "l_shipdate", dir)
    }
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().toSet
    val beforeFiles = partFiles(dir)
    assert(beforeFiles.values.exists(_ > 1), "fixture must start fragmented")

    val plan = FileLoads.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024,
      sortCols = Seq("l_orderkey"))
    assert(plan.nonEmpty)
    val afterFiles = partFiles(dir)
    plan.foreach { case (part, (nBefore, nAfter)) =>
      assert(afterFiles(part) == nAfter && nAfter < nBefore)
    }
    // untouched partitions keep their file layout
    (beforeFiles.keySet -- plan.keySet).foreach { p =>
      assert(afterFiles(p) == beforeFiles(p))
    }
    assert(spark.read.parquet(dir).collect().toSet == beforeRows)
    // idempotent: a second pass finds nothing to do
    assert(FileLoads.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024).isEmpty)
  }

  private def partFiles(dir: String): Map[String, Int] =
    new java.io.File(dir).listFiles().filter(f => f.isDirectory && f.getName.startsWith("p_date="))
      .map(p => p.getName -> p.listFiles().count(_.getName.endsWith(".parquet"))).toMap

  test("format breadth: orc/csv/json sinks round-trip the documents table") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
      .select("doc_id", "lang", "source", "n_chars") // csv: flat columns only
    val want = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    Seq("orc", "json", "csv").foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toString
      docs.write.mode("overwrite").format(fmt).option("header", "true").save(dir)
      val back = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true").load(dir)
        .select(col("doc_id").cast("long"), col("lang"), col("source"),
          col("n_chars").cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      assert(back == want, s"$fmt round-trip")
    }
  }
}
