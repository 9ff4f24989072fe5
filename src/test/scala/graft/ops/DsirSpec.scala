package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class DsirSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("importanceWeights known answer on a two-bucket toy corpus") {
    // one-word docs, unigrams (n=1): every gram of a doc is the doc's word
    val corpus = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("id", "text")
    val target = Seq((10L, "aa")).toDF("id", "text")
    val got = Dsir.importanceWeights(corpus, target, "id", "text",
        n = 1, bucketHexLen = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = 256.0
    // raw: bucket(aa)=2, bucket(bb)=1, R=3; target: bucket(aa)=1, T=1
    val wAa = math.log((1 + 1) / (1 + b)) - math.log((2 + 1) / (3 + b))
    val wBb = math.log((0 + 1) / (1 + b)) - math.log((1 + 1) / (3 + b))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == r4(wAa) && got(2L) == r4(wAa) && got(3L) == r4(wBb))
    // target-like docs must outscore the rest
    assert(got(1L) > got(3L))
  }

  test("multi-gram docs sum per-gram deltas with multiplicity") {
    val corpus = Seq((1L, "x x"), (2L, "y")).toDF("id", "text")
    val target = Seq((10L, "x")).toDF("id", "text")
    val got = Dsir.importanceWeights(corpus, target, "id", "text",
        n = 1, bucketHexLen = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = 256.0
    // raw: x→2, y→1, R=3; target: x→1, T=1; doc 1 has TWO x grams
    val dx = math.log(2 / (1 + b)) - math.log(3 / (3 + b))
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == r4(2 * dx))
  }

  test("docs shorter than n yield no weight row") {
    val corpus = Seq((1L, "only"), (2L, "two words")).toDF("id", "text")
    val target = Seq((10L, "two words")).toDF("id", "text")
    val got = Dsir.importanceWeights(corpus, target, "id", "text", n = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("fixture: English-target weights rank English docs above non-English") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val target = docs.filter(col("lang") === "en")
    val w = Dsir.importanceWeights(docs, target, "doc_id", "text")
    val means = docs.join(w, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("log_w")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"expected en avg ${means(true)} > non-en avg ${means(false)}")
  }

  test("plan: model broadcasts into the scoring scan; no corpus-wide model shuffle") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val q = Dsir.importanceWeights(docs, docs.filter(col("lang") === "en"),
      "doc_id", "text")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
