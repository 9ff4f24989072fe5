package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class Bm25IndexSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def docs = Tables.documents(spark, GraftSpark.Sf0001)

  private def queries = {
    import spark.implicits._
    Seq((1L, "hash"), (1L, "join"), (1L, "dup"),
      (2L, "window"), (2L, "sort"), (2L, "merge")).toDF("q_id", "term")
  }

  test("index-served topK equals the from-scratch bm25TopK exactly") {
    val fromScratch = TextAnalysis.bm25TopK(
      docs, "doc_id", "text", queries, "q_id", "term", k = 10)
    val served = Bm25Index.topK(
        Bm25Index.build(docs, "doc_id", "text"), queries, "q_id", "term", k = 10)
      .withColumnRenamed("id", "doc_id")
    assert(served.exceptAll(fromScratch).isEmpty &&
      fromScratch.exceptAll(served).isEmpty)
  }

  test("write → read round-trips: served results identical, postings equal") {
    val dir = Files.createTempDirectory("graft_bm25_spec").toString
    val built = Bm25Index.build(docs, "doc_id", "text")
    Bm25Index.write(built, dir)
    val read = Bm25Index.read(spark, dir)
    assert(read.postings.exceptAll(built.postings).isEmpty &&
      built.postings.exceptAll(read.postings).isEmpty)
    val a = Bm25Index.topK(built, queries, "q_id", "term", k = 10)
    val b = Bm25Index.topK(read, queries, "q_id", "term", k = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("serve path pushes the query terms into the postings parquet scan") {
    val dir = Files.createTempDirectory("graft_bm25_push").toString
    Bm25Index.write(Bm25Index.build(docs, "doc_id", "text"), dir)
    val plan = Bm25Index.topK(Bm25Index.read(spark, dir),
      queries, "q_id", "term", k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"expected a pushed In(term, …) filter on the postings scan:\n$plan")
  }

  test("oversized term batches fall back to the semi-join path with equal results") {
    import spark.implicits._
    val big = (0 until Bm25Index.MaxPushdownTerms + 50)
      .map(i => (1L, s"zz_unseen_$i")).toDF("q_id", "term")
      .unionByName(queries)
    val idx = Bm25Index.build(docs, "doc_id", "text")
    val viaBig = Bm25Index.topK(idx, big, "q_id", "term", k = 10)
    // unseen terms contribute no postings rows, so scores match the small set
    val viaSmall = Bm25Index.topK(idx, queries, "q_id", "term", k = 10)
    assert(viaBig.exceptAll(viaSmall).isEmpty && viaSmall.exceptAll(viaBig).isEmpty)
  }

  test("append equals a full rebuild: postings, df, stats, and served results") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val appended = Bm25Index.append(
      Bm25Index.build(base, "doc_id", "text"), delta, "doc_id", "text")
    val rebuilt = Bm25Index.build(docs, "doc_id", "text")
    assert(appended.postings.exceptAll(rebuilt.postings).isEmpty &&
      rebuilt.postings.exceptAll(appended.postings).isEmpty)
    assert(appended.terms.exceptAll(rebuilt.terms).isEmpty &&
      rebuilt.terms.exceptAll(appended.terms).isEmpty)
    val (sa, sr) = (appended.stats.head(), rebuilt.stats.head())
    assert(sa.getDouble(0) == sr.getDouble(0))
    assert(math.abs(sa.getDouble(1) - sr.getDouble(1)) < 1e-9,
      s"avgdl recombination drifted: ${sa.getDouble(1)} vs ${sr.getDouble(1)}")
    val a = Bm25Index.topK(appended, queries, "q_id", "term", k = 10)
    val b = Bm25Index.topK(rebuilt, queries, "q_id", "term", k = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "appended-index serve must be EXACTLY the rebuilt-index serve")
  }

  test("erase equals a rebuild on the retained corpus: postings, df, stats, serve") {
    import spark.implicits._
    val victims = docs.filter(col("doc_id") % 10 === 3)
    val erased = Bm25Index.erase(
      Bm25Index.build(docs, "doc_id", "text"),
      victims.select(col("doc_id")))
    val rebuilt = Bm25Index.build(docs.filter(col("doc_id") % 10 =!= 3),
      "doc_id", "text")
    assert(erased.postings.exceptAll(rebuilt.postings).isEmpty &&
      rebuilt.postings.exceptAll(erased.postings).isEmpty)
    assert(erased.terms.exceptAll(rebuilt.terms).isEmpty &&
      rebuilt.terms.exceptAll(erased.terms).isEmpty)
    val (se, sr) = (erased.stats.head(), rebuilt.stats.head())
    assert(se.getDouble(0) == sr.getDouble(0))
    assert(math.abs(se.getDouble(1) - sr.getDouble(1)) < 1e-9,
      s"avgdl subtraction drifted: ${se.getDouble(1)} vs ${sr.getDouble(1)}")
    val a = Bm25Index.topK(erased, queries, "q_id", "term", k = 10)
    val b = Bm25Index.topK(rebuilt, queries, "q_id", "term", k = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "erased-index serve must be EXACTLY the retained-rebuild serve")
    // and the erased ids can never come back
    assert(Bm25Index.topK(erased, queries, "q_id", "term", k = 1000)
      .join(victims.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .isEmpty)
    intercept[IllegalArgumentException] {
      Bm25Index.erase(rebuilt, victims.select("doc_id", "text"))
    }
    // verifyCovered: an id with no postings (never indexed) fails fast
    // instead of silently mis-subtracting n/avgdl
    intercept[IllegalArgumentException] {
      Bm25Index.erase(rebuilt, Seq(999999L).toDF("doc_id"), verifyCovered = true)
    }
    assert(Bm25Index.erase(rebuilt,
      docs.filter(col("doc_id") % 10 =!= 3).limit(1).select(col("doc_id")),
      verifyCovered = true).stats.head().getDouble(0) > 0)
  }

  test("append verifyDisjoint rejects a delta that re-ships live doc ids") {
    val idx = Bm25Index.build(docs.filter(col("doc_id") < 100), "doc_id", "text")
    intercept[IllegalArgumentException] {
      Bm25Index.append(idx, docs.filter(col("doc_id") < 10), "doc_id", "text",
        verifyDisjoint = true)
    }
    // disjoint delta passes the same audit
    val ok = Bm25Index.append(idx,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 110),
      "doc_id", "text", verifyDisjoint = true)
    assert(ok.stats.head().getDouble(0) ==
      docs.filter(col("doc_id") < 110).count().toDouble)
  }
}
