package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def tiny = {
    import spark.implicits._
    // 3 "en" docs, 2 "fr" docs with a clean vocabulary split
    Seq(
      (1L, "en", "the cat sat"),
      (2L, "en", "the dog sat"),
      (3L, "en", "the cat ran"),
      (4L, "fr", "le chat noir"),
      (5L, "fr", "le chien noir")).toDF("doc_id", "lang", "text")
  }

  test("model matches hand-computed Laplace-smoothed conditionals") {
    val m = NaiveBayes.model(tiny, "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // vocab = {the,cat,sat,dog,ran,le,chat,noir,chien} → V=9
    // en totals: 9 tokens; fr totals: 6 tokens
    val v = 9.0
    assert(m(("en", "the"))._1 == 3L)
    assert(math.abs(m(("en", "the"))._2 - (math.log(4.0) - math.log(9.0 + v))) < 1e-12)
    assert(m(("en", "cat"))._1 == 2L)
    assert(math.abs(m(("en", "cat"))._2 - (math.log(3.0) - math.log(9.0 + v))) < 1e-12)
    assert(m(("fr", "noir"))._1 == 2L)
    assert(math.abs(m(("fr", "noir"))._2 - (math.log(3.0) - math.log(6.0 + v))) < 1e-12)
    // no dense grid: absent (label, token) pairs have no row
    assert(!m.contains(("fr", "cat")))
  }

  test("predict scores match the hand-expanded smoothed log-likelihood") {
    import spark.implicits._
    val test = Seq((10L, "the cat"), (11L, "le chien")).toDF("doc_id", "text")
    val got = NaiveBayes.predict(test, "doc_id", "text", tiny, "lang", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val v = 9.0
    def en(hit: Double, nv: Double) = math.log(3.0 / 5.0) + hit - nv * math.log(9.0 + v)
    def fr(hit: Double, nv: Double) = math.log(2.0 / 5.0) + hit - nv * math.log(6.0 + v)
    // doc 10 "the cat": en hit = ln(3+1)+ln(2+1); fr hit = 0 (no fr rows)
    val s10en = en(math.log(4.0) + math.log(3.0), 2.0)
    val s10fr = fr(0.0, 2.0)
    assert(got(10L)._1 == "en")
    assert(math.abs(got(10L)._2 - math.rint(s10en * 1e4) / 1e4) < 1e-9)
    assert(s10en > s10fr)
    // doc 11 "le chien": fr wins symmetrically
    assert(got(11L)._1 == "fr")
    val s11fr = fr(math.log(3.0) + math.log(2.0), 2.0)
    assert(math.abs(got(11L)._2 - math.rint(s11fr * 1e4) / 1e4) < 1e-9)
  }

  test("predict emits exactly one row per doc, OOV-only docs included") {
    import spark.implicits._
    // zz is out of vocabulary for both labels → prior-only score, still
    // one deterministic argmax row (tie-broken by label if priors tied)
    val test = Seq((20L, "zz zz"), (21L, "")).toDF("doc_id", "text")
    val got = NaiveBayes.predict(test, "doc_id", "text", tiny, "lang", "text")
    assert(got.count() == 2)
    val r20 = got.filter(col("doc_id") === 20L).head()
    // prior ln(3/5) > ln(2/5) → en
    assert(r20.getString(1) == "en")
    assert(math.abs(r20.getDouble(2) - math.rint(math.log(0.6) * 1e4) / 1e4) < 1e-9)
  }

  test("fixture round-trip: language prediction recovers lang on held-in docs") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val pred = NaiveBayes.predict(
      train.limit(50), "doc_id", "text", train, "lang", "text")
    val joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
    val acc = joined.filter(col("pred_label") === col("lang")).count().toDouble /
      joined.count()
    // word-soup fixture text is only weakly language-separable; NB on its
    // own training docs must still beat the uniform-prior floor by a lot
    val nLangs = docs.select("lang").distinct().count().toDouble
    assert(acc > 1.5 / nLangs, s"train accuracy $acc vs ${1.0 / nLangs} uniform")
  }
}
