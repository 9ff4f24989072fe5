package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class E2eCurationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def run = SparkEntry.queries("e2e_curation_pipeline")(spark, GraftSpark.Sf0001)

  test("pipeline output is a strict filter of the clone-injected corpus") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val corpusIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet ++
      docs.filter(col("doc_id") < 50).collect().map(_.getLong(0) + 1000000L)
    val out = run.collect().map(_.getLong(0))
    assert(out.nonEmpty && out.length < corpusIds.size, "some stage must prune")
    assert(out.toSet.subsetOf(corpusIds), "no invented rows")
    assert(out.length == out.distinct.length, "no duplicate ids")
  }

  test("each stage's semantics hold on the output") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val outIds = run.collect().map(_.getLong(0)).toSet
    // decontam: no surviving doc shares an 8-gram with the bench slice —
    // in particular no bench member survives (it matches itself)
    val benchIds = docs.filter(col("doc_id") % 25 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outIds.intersect(benchIds).isEmpty, "bench docs must be removed")
    // dedup: a clone (id >= 1000000) may survive only if its original was
    // pruned earlier — never alongside it (same text → one winner, min id)
    val cloneSurvivors = outIds.filter(_ >= 1000000L).map(_ - 1000000L)
    assert(cloneSurvivors.intersect(outIds).isEmpty,
      "an original and its clone both survived exact dedup")
    // quality: every survivor passes the gate thresholds it was filtered by
    val q = graft.ops.TextAnalysis.qualityFilter(docs, "text", 20, 0.02, 0.85)
      .filter(col("reject_reason") =!= "kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outIds.intersect(q).isEmpty, "a quality-rejected doc survived")
  }

  test("observedStages: per-stage counts from ONE action equal per-stage count() runs") {
    import spark.implicits._
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val stages: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "a_filter" -> (df => df.filter(col("n_chars") > 200)),
      "b_lang" -> (df => df.filter(col("lang") === "en")),
      "c_dedup" -> (df => graft.ops.Dedup.exact(df, Seq("text"), "doc_id")))
    val (metrics, total) = graft.etl.Pipeline.observedStages(stages, docs)(_.count())
    val m = metrics.toMap
    // independent recomputation, one count per prefix (the naive form)
    val s1 = docs.filter(col("n_chars") > 200)
    val s2 = s1.filter(col("lang") === "en")
    val s3 = graft.ops.Dedup.exact(s2, Seq("text"), "doc_id")
    assert(m("a_filter") == s1.count())
    assert(m("b_lang") == s2.count())
    assert(m("c_dedup") == s3.count())
    assert(total == s3.count())
    assert(metrics.map(_._1) == stages.map(_._1), "stage order preserved")
  }

  test("observedStages rejects duplicate stage names up front") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val dup: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "s" -> (df => df), "s" -> (df => df))
    intercept[IllegalArgumentException](
      graft.etl.Pipeline.observedStages(dup, docs)(_.count()))
  }

  test("e2e_observed_metrics declared query reports monotone shrinking stages") {
    val rows = SparkEntry.queries("e2e_observed_metrics")(spark, GraftSpark.Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.map(_._1).toSeq == Seq("1_quality", "2_decontam", "3_dedup"))
    val ns = rows.map(_._2)
    assert(ns(0) >= ns(1) && ns(1) >= ns(2) && ns(2) > 0)
  }
}
