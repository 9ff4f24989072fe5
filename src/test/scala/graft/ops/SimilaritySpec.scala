package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f), 2),
      (Array(1.0f, 0.0f), Array(-3.0f, 0.0f), 3)).toDF("a", "b", "id")
    val out = df.orderBy("id")
      .select(round(Similarity.cosine(col("a"), col("b")), 6)).collect()
      .map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("bruteForceTopK returns k ranked neighbors per query, self excluded") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
      "vec_id", "embedding", k = 3)
    val rows = out.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("n_id")))
    // ranks are 1..3 per query, sims non-increasing within a query
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK hits a reasonable fraction of the exact top-k (recall check)") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 6 planes = 64 buckets for a 500-vector corpus (~8/bucket, 7 probe
    // buckets per query) — plane count must track corpus density
    val approx = Similarity.lshTopK(q, emb, "vec_id", "embedding", k = 5, numPlanes = 6)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"ANN recall $recall collapsed — bucketing broken?")
  }

  test("lshSignature is deterministic") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001).limit(10)
    val a = emb.select(Similarity.lshSignature(col("embedding"), 12)).collect().map(_.getLong(0))
    val b = emb.select(Similarity.lshSignature(col("embedding"), 12)).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }
}
