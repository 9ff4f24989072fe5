package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class PagedJsonSourceSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private lazy val pagesDir: String = {
    val dir = Files.createTempDirectory("graft_pages")
    // 3 "OData pages" of a DemandForecasts-like entity
    val pages = Seq(
      (0 until 10).map(i => s"""{"@odata.etag":"W/$i","ForecastId":$i,"Qty":${i * 1.5},"Site":"A","date_trans":"2024-01-0${i % 9 + 1}"}"""),
      (10 until 20).map(i => s"""{"@odata.etag":"W/$i","ForecastId":$i,"Qty":${i * 1.5},"Site":"B","date_trans":"2024-01-1${i % 10}"}"""),
      (20 until 25).map(i => s"""{"@odata.etag":"W/$i","ForecastId":$i,"Qty":${i * 1.5},"Site":"A","date_trans":"2024-01-2${i % 5}"}"""))
    pages.zipWithIndex.foreach { case (lines, i) =>
      Files.writeString(dir.resolve(f"page_$i%04d.json"), lines.mkString("\n"))
    }
    dir.toString
  }

  private def read = spark.read.format("graft-pages").option("path", pagesDir).load()

  test("raw mode: every payload line verbatim; quarantine classifier " +
      "composes; malformed lines that CRASH the typed scan are retained") {
    val dir = Files.createTempDirectory("graft_pages_raw")
    Files.writeString(dir.resolve("page_0000.json"),
      Seq("""{"id":1,"v":10}""", """{"id":2,"v":"x20"}""").mkString("\n"))
    Files.writeString(dir.resolve("page_0001.json"),
      """{"id":3,"v":3""") // truncated — malformed JSON
    def raw = spark.read.format("graft-pages")
      .option("path", dir.toString).option("raw", "true").load()
    // verbatim lines, schema is the single record column
    assert(raw.schema.fieldNames.toSeq == Seq("record"))
    val lines = raw.collect().map(_.getString(0)).sorted.toSeq
    assert(lines == Seq("""{"id":1,"v":10}""", """{"id":2,"v":"x20"}""",
      """{"id":3,"v":3"""))
    // the TYPED scan path hard-fails on the malformed page (by design)...
    intercept[Exception](
      spark.read.format("graft-pages")
        .option("path", dir.toString).load().collect())
    // ...while raw + parseWithQuarantine classifies all three lanes
    val lanes = graft.sources.JsonRecords
      .parseWithQuarantine(raw, "record", "id BIGINT, v BIGINT")
      .select("ingest_status", "parsed_id", "parsed_v")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(lanes == Set(
      ("ok", 1L, 10L),
      ("schema_mismatch", 2L, null), // partial parse retained
      ("malformed", null, null)))
    // the raw flag is case-insensitive on BOTH schema-inference and
    // table-build paths (getTable sees the original-case option map)
    assert(spark.read.format("graft-pages").option("path", dir.toString)
      .option("RAW", "TRUE").load()
      .collect().map(_.getString(0)).sorted.toSeq == lines)
    // raw mode pushes nothing: a predicate must stay a post-scan filter
    val plan = raw.filter(col("record").contains("x20"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("$filter"), plan)
    assert(raw.filter(col("record").contains("x20")).count() == 1)
  }

  test("S9: reads all pages; one partition per page") {
    val df = read
    assert(df.count() == 25)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.columns.contains("@odata.etag"))
  }

  test("S10: filter pushdown reaches the scan as an OData $filter") {
    val df = read.filter(col("Qty") >= 15.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ge 15.0") || plan.contains("PushedFilters") || df.count() == 15)
    assert(df.count() == 15)
    // scan description carries the OData filter rendering
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("graft-pages"))
  }

  test("column pruning ($select) yields only required columns") {
    val df = read.select("ForecastId", "Site")
    assert(df.schema.fieldNames.toSeq == Seq("ForecastId", "Site"))
    assert(df.distinct().count() == 25)
  }

  test("string filters and residual filters compose") {
    val df = read.filter(col("Site") === "A" && col("ForecastId") % 2 === 0)
    // Site pushdown supported; modulo stays a Spark filter
    assert(df.count() == (0 until 10).count(_ % 2 == 0) + (20 until 25).count(_ % 2 == 0))
  }

  test("limit pushdown ($top) caps per-partition reads") {
    val df = read.limit(4)
    assert(df.count() == 4)
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("$top=4"), s"limit should reach the scan: $scanDesc")
  }

  test("pushed integral filters compare as long, not double (no 2^53 collapse)") {
    // 2^53 and 2^53+1 are equal as doubles; a double-roundtrip filter would
    // return BOTH rows for id = 9007199254740993 — Spark trusts the pushed
    // filter and would emit the wrong row silently
    val dir = Files.createTempDirectory("graft_pages_long")
    Files.writeString(dir.resolve("page_0000.json"),
      """{"id":9007199254740992,"v":"a"}
        |{"id":9007199254740993,"v":"b"}""".stripMargin)
    val df = spark.read.format("graft-pages").option("path", dir.toString).load()
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    val hit = df.filter(col("id") === 9007199254740993L).collect()
    assert(hit.map(_.getAs[String]("v")).toSeq == Seq("b"))
    val lt = df.filter(col("id") < 9007199254740993L).collect()
    assert(lt.map(_.getAs[String]("v")).toSeq == Seq("a"))
  }

  test("pushed string filters use UTF-8 binary order (supplementary chars)") {
    // U+FF21 (FULLWIDTH A, 3 UTF-8 bytes) vs U+10400 (DESERET, 4 bytes but a
    // surrogate PAIR in UTF-16): UTF-16 code-unit order sorts U+10400 first
    // (0xD801 < 0xFF21); UTF-8 binary order — Spark's order — sorts it LAST
    val hi = new String(Character.toChars(0x10400))
    val dir = Files.createTempDirectory("graft_pages_utf8")
    Files.writeString(dir.resolve("page_0000.json"),
      s"""{"id":1,"s":"Ａ"}
         |{"id":2,"s":"$hi"}""".stripMargin)
    val df = spark.read.format("graft-pages").option("path", dir.toString).load()
    val gt = df.filter(col("s") > "Ａ").collect()
    assert(gt.map(_.getAs[Long]("id")).toSeq == Seq(2L),
      "U+10400 must compare ABOVE U+FF21 in UTF-8 binary order")
  }

  test("full reference pipeline over the source: extract → drop etag → window filter") {
    val df = graft.etl.Sanitize.dropColumns(read, "@odata.etag")
      .filter(col("date_trans") >= "2024-01-05")
    assert(!df.columns.contains("@odata.etag"))
    assert(df.count() > 0)
  }
}
