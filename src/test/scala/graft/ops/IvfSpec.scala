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

  test("ivfTopK is deterministic across runs") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val q = emb.filter(col("vec_id") < 5)
    def run() = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, lloydIters = 1)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
