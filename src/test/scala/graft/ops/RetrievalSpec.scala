package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // two legs for one query: doc 100 ranks 1 in BOTH; 101/102 in one each
  private def legA = Seq((1L, 100L, 1L), (1L, 101L, 2L), (1L, 103L, 3L))
    .toDF("q_id", "doc_id", "rank")
  private def legB = Seq((1L, 100L, 1L), (1L, 102L, 2L), (1L, 103L, 4L))
    .toDF("q_id", "doc_id", "rank")

  test("rrf scores match the hand formula; both-leg docs outrank single-leg docs") {
    val out = Retrieval.rrfFuse(Seq(legA, legB), "q_id", "doc_id", k = 10)
      .collect().map(r => r.getLong(2) ->
        (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    def rrf(rs: Seq[Long]): Double =
      math.round(rs.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    assert(out(100L) == ((1L, rrf(Seq(1, 1)), 2L)))
    assert(out(103L) == ((2L, rrf(Seq(3, 4)), 2L))) // two weak votes beat one strong
    assert(out(101L)._2 == rrf(Seq(2)) && out(101L)._3 == 1L)
    assert(out(102L)._2 == rrf(Seq(2)) && out(102L)._3 == 1L)
    // equal-rrf tie (101 vs 102, both rank-2 single-leg) breaks on doc id
    assert(out(101L)._1 < out(102L)._1)
  }

  test("k truncates per query independently; queries never mix") {
    val two = legA.unionByName(legA.withColumn("q_id", lit(2L)))
    val out = Retrieval.rrfFuse(Seq(two), "q_id", "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 4)
    assert(out.filter(_._1 == 1L).map(_._3).toSet == Set(100L, 101L))
    assert(out.filter(_._1 == 2L).map(_._3).toSet == Set(100L, 101L))
  }

  test("fusing the corpus legs matches a driver-side recomputation") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val emb = graft.etl.Tables.embeddings(spark, GraftSpark.Sf0001)
    val qs = Seq((1L, "hash"), (1L, "join"), (2L, "sort")).toDF("q_id", "term")
    val bm = TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, "q_id", "term", k = 5)
      .select(col("q_id"), col("doc_id"), col("rank"))
    val vec = Similarity.bruteForceTopK(emb.filter(col("vec_id").isin(1L, 2L)), emb,
        "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
    val got = Retrieval.rrfFuse(Seq(bm, vec), "q_id", "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val manual = (bm.collect() ++ vec.collect())
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue)
      .groupBy(p => p._1).view.mapValues { rs =>
        math.round(rs.map(p => 1.0 / (60 + p._2)).sum * 1e6) / 1e6
      }.toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      // ranks dense 1..n, rrf non-increasing, values match the manual fold
      assert(rows.map(_._2).sorted.sameElements(1L to rows.length))
      val sorted = rows.sortBy(_._2)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a._4 >= b._4 })
      rows.foreach(r => assert(r._4 == manual((q, r._3)), s"q=$q doc=${r._3}"))
    }
    assert(got.nonEmpty)
  }
}
