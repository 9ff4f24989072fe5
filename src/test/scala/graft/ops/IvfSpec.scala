package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class IvfSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("ivfTopK returns ranked neighbors and achieves reasonable recall vs exact") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5,
      nlist = 8, nprobe = 3, lloydIters = 1)
    val got = ivf.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall collapsed")
    // ranks well-formed
    val ranks = ivf.groupBy("q_id").agg(max("rank").as("mx"), count(lit(1)).as("n")).collect()
    assert(ranks.forall(r => r.getAs[Long]("n") <= 5))
  }

  test("ivfTopK recall vs exact at the DECLARED query parameters (k=5, nlist=16, nprobe=4)") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val q = emb.filter(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 4, lloydIters = 1)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"declared-parameter IVF recall $recall collapsed")
  }

  test("ivfTopK plan has no Exchange between corpus scan and cluster assignment") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val q = emb.filter(col("vec_id") < 5)
    val plan = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, lloydIters = 0).queryExecution.executedPlan.toString
    // assignment must be expression-only: no monotonically_increasing_id /
    // per-row window remains anywhere in the plan
    assert(!plan.contains("monotonically_increasing_id"), plan)
    assert(plan.contains("nearestcentroid") || plan.contains("NearestCentroid"), plan)
  }

  test("ivfTopK is deterministic across runs") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val q = emb.filter(col("vec_id") < 5)
    def run() = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, lloydIters = 1)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
