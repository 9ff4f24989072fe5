package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Sanitize

class JsonRecordsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("T2: OData-shaped JSON records normalize to a table; etag dropped (S9→P2 path)") {
    val records = Seq(
      """{"@odata.etag":"W/\"1\"","ForecastId":1,"Qty":10.5,"Site":"A"}""",
      """{"@odata.etag":"W/\"2\"","ForecastId":2,"Qty":3.0,"Site":"B"}""")
    val df = Sanitize.dropColumns(JsonRecords.fromRecords(spark, records), "@odata.etag")
    assert(df.columns.sorted.toSeq == Seq("ForecastId", "Qty", "Site"))
    assert(df.count() == 2)
  }

  test("fromPages flattens pages and parallelizes parse") {
    val pages = Seq(
      Seq("""{"a":1}""", """{"a":2}"""),
      Seq("""{"a":3}"""))
    val df = JsonRecords.fromPages(spark, pages)
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions >= 1)
  }
}
