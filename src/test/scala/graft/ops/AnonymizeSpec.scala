package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class AnonymizeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("kAnonymize keeps exactly the rows of groups with >= k members") {
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "fr", "a"), (5L, "fr", "b"),
      (6L, "de", "c")).toDF("id", "lang", "src")
    val got = Anonymize.kAnonymize(df, Seq("lang", "src"), k = 2)
      .select("id").as[Long].collect().toSet
    // (en,a) has 3 members; every other group is a singleton
    assert(got == Set(1L, 2L, 3L))
    // k=1 is the identity
    assert(Anonymize.kAnonymize(df, Seq("lang", "src"), 1).count() == 6)
  }

  test("kAnonymize: NULL quasi values form their own (anonymizable) group") {
    val df = Seq(
      (1L, Some("en")), (2L, None), (3L, None), (4L, Some("fr"))
    ).toDF("id", "lang")
    val got = Anonymize.kAnonymize(df, Seq("lang"), k = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("generalizeRare folds sub-k values into the fallback, keeps rows and NULLs") {
    val df = Seq(
      (1L, Some("src1")), (2L, Some("src1")), (3L, Some("src2")),
      (4L, None)).toDF("id", "src")
    val got = Anonymize.generalizeRare(df, "src", k = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("src1"), 2L -> Some("src1"),
      3L -> Some("other"), 4L -> None))
  }

  test("lDiversityAudit reports group size and distinct sensitive count") {
    val df = Seq(
      ("en", "s1", "med"), ("en", "s1", "med"), ("en", "s1", "law"),
      ("fr", "s2", "med")).toDF("lang", "src", "topic")
    val got = Anonymize.lDiversityAudit(df, Seq("lang", "src"), "topic")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(("en", "s1") -> (3L, 2L), ("fr", "s2") -> (1L, 1L)))
  }

  test("fixture: suppression drops every released row whose group is sub-k, keeps the rest") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val k = 3
    val out = Anonymize.kAnonymize(docs, Seq("lang", "source"), k)
    val sizes = out.groupBy("lang", "source").count()
    assert(sizes.filter(col("count") < k).isEmpty)
    // equivalent formulation: semi-join against HAVING count >= k
    val keep = docs.groupBy("lang", "source").count().filter(col("count") >= k)
      .drop("count")
    val expected = docs.join(keep, Seq("lang", "source"), "left_semi")
      .select(docs.columns.map(col).toSeq: _*)
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  test("kAnonymize plan: one exchange, no second corpus scan") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val plan = Anonymize.kAnonymize(docs, Seq("lang", "source"), 5)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }
}
