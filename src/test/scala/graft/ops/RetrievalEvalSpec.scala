package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class RetrievalEvalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def r4(x: Double) = math.round(x * 1e4) / 1e4

  test("hand-computed recall/MRR/nDCG on a crafted run") {
    // q1 judged: {d1: 3, d2: 1, d3: 2} (3 relevant docs)
    // q1 run (k=3): rank1 = d9 (miss), rank2 = d1, rank3 = d3
    val run = Seq((1L, 9L, 1L), (1L, 1L, 2L), (1L, 3L, 3L))
      .toDF("q_id", "doc_id", "rank")
    val qrels = Seq((1L, 1L, 3), (1L, 2L, 1), (1L, 3L, 2))
      .toDF("q_id", "doc_id", "grade")
    val got = RetrievalEval.evaluate(run, qrels, "q_id", "doc_id", "grade", k = 3)
      .collect().head
    assert(got.getLong(1) == 3 && got.getLong(2) == 2) // n_rel, n_hit
    assert(got.getDouble(3) == r4(2.0 / 3.0), "recall@3")
    assert(got.getDouble(4) == 0.5, "MRR: first hit at rank 2")
    // DCG = (2^3−1)/log2(3) + (2^2−1)/log2(4); IDCG ranks grades 3,2,1
    val dcg = 7.0 / (math.log(3) / math.log(2)) + 3.0 / 2.0
    val idcg = 7.0 / 1.0 + 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    assert(got.getDouble(5) == r4(dcg / idcg), s"nDCG got ${got.getDouble(5)}")
  }

  test("a perfect ideally-ordered run scores 1.0 everywhere; an all-miss run scores 0") {
    val qrels = Seq((1L, 1L, 2), (1L, 2L, 1)).toDF("q_id", "doc_id", "grade")
    val perfect = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("q_id", "doc_id", "rank")
    val p = RetrievalEval.evaluate(perfect, qrels, "q_id", "doc_id", "grade", k = 5)
      .collect().head
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 1.0 && p.getDouble(5) == 1.0)
    val miss = Seq((1L, 7L, 1L), (1L, 8L, 2L)).toDF("q_id", "doc_id", "rank")
    val m = RetrievalEval.evaluate(miss, qrels, "q_id", "doc_id", "grade", k = 5)
      .collect().head
    assert(m.getLong(2) == 0 && m.getDouble(3) == 0.0 &&
      m.getDouble(4) == 0.0 && m.getDouble(5) == 0.0)
  }

  test("fewer judged docs than k still allows nDCG 1.0; rank > k rows are ignored") {
    val qrels = Seq((1L, 1L, 1)).toDF("q_id", "doc_id", "grade")
    val run = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 11L))
      .toDF("q_id", "doc_id", "rank")
    val r = RetrievalEval.evaluate(run, qrels, "q_id", "doc_id", "grade", k = 10)
      .collect().head
    assert(r.getDouble(5) == 1.0, "IDCG caps at the judged set")
    // the rank-11 row is outside k and contributes nothing
    val qrels2 = Seq((1L, 3L, 1)).toDF("q_id", "doc_id", "grade")
    val r2 = RetrievalEval.evaluate(run, qrels2, "q_id", "doc_id", "grade", k = 10)
      .collect().head
    assert(r2.getLong(2) == 0 && r2.getDouble(4) == 0.0)
    intercept[IllegalArgumentException](
      RetrievalEval.evaluate(run, qrels, "q_id", "doc_id", "grade", 0))
  }
}
