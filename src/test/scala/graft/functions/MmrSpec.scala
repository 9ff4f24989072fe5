package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class MmrSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def run(cands: Seq[(Long, Double, Array[Float])], lambda: Double, k: Int) =
    Seq(Tuple1(cands.map(c => (c._1, c._2, c._3))))
      .toDF("cands")
      .select(explode(MmrFunctions.mmr_select(col("cands"), lambda, k)).as("s"))
      .select(col("s.id"), col("s.mmr"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("redundant near-duplicate is demoted below a diverse candidate") {
    val x = Array(1f, 0f, 0f)
    val xDup = Array(0.99f, 0.01f, 0f) // ≈ x: cosine ~1
    val y = Array(0f, 1f, 0f)          // orthogonal to x
    val out = run(Seq((10L, 0.90, x), (11L, 0.89, xDup), (12L, 0.50, y)),
      lambda = 0.7, k = 3)
    // pick 1: highest sim (10). pick 2: 11 scores .7*.89-.3*~1 ≈ .323 vs
    // 12 at .7*.5-0 = .35 → the DIVERSE 12 wins despite lower sim
    assert(out.map(_._1) == Seq(10L, 12L, 11L), s"order ${out.map(_._1)}")
    // first pick score = λ·sim with empty selected set
    assert(out.head._2 == 0.63)
  }

  test("null candidate entries and null vectors are skipped, not NPE'd") {
    val x = Array(1f, 0f, 0f)
    val y = Array(0f, 1f, 0f)
    val out = Seq(Tuple1(Seq(Some((10L, 0.9, Some(x))), None,
        Some((12L, 0.5, Some(y))), Some((13L, 0.8, Option.empty[Array[Float]])))))
      .toDF("cands")
      .select(explode(MmrFunctions.mmr_select(col("cands"), 0.7, 5)).as("s"))
      .select(col("s.id")).as[Long].collect().toSeq
    // the null element and the null-vector candidate vanish; the two
    // real candidates rank normally
    assert(out == Seq(10L, 12L), s"got $out")
  }

  test("mismatched vector lengths fail with a descriptive error, not AIOOBE") {
    val e = intercept[org.apache.spark.SparkException] {
      run(Seq((1L, 0.9, Array(1f, 0f, 0f)), (2L, 0.8, Array(1f, 0f))), 0.7, 5)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must share a dimension")), e.getMessage)
  }

  test("selection is input-order invariant and ties break to the lower id") {
    val vs = Seq(
      (5L, 0.8, Array(1f, 0f, 0f)),
      (3L, 0.8, Array(0f, 1f, 0f)), // same sim as 5 → tie → id 3 first
      (9L, 0.6, Array(0f, 0f, 1f)))
    val a = run(vs, 0.7, 3)
    val b = run(vs.reverse, 0.7, 3)
    assert(a == b, "input order changed the selection")
    assert(a.head._1 == 3L, "tie must break to the lower id")
  }

  test("k caps the output; k >= n returns everything exactly once") {
    val vs = (0 until 6).map(i =>
      (i.toLong, 1.0 - i * 0.1, Array.tabulate(3)(j => if (j == i % 3) 1f else 0f)))
    assert(run(vs, 0.5, 2).size == 2)
    val all = run(vs, 0.5, 10)
    assert(all.map(_._1).sorted == (0L until 6L))
  }

  test("matches a driver-side greedy recomputation on corpus candidates") {
    val emb = graft.etl.Tables.embeddings(spark, GraftSpark.Sf0001)
    val nn = graft.ops.Similarity.bruteForceTopK(
      emb.filter(col("vec_id").isin(1L, 2L)), emb, "vec_id", "embedding", k = 10)
    val cands = nn
      .join(emb.select(col("vec_id").as("n_id"), col("embedding").as("vec")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), col("sim"), col("vec"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        r.getSeq[Float](3).toArray.map(_.toDouble))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    def greedy(cs: Seq[(Long, Double, Array[Double])], lam: Double, k: Int) = {
      def cos(a: Array[Double], b: Array[Double]) = {
        val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
        if (d == 0) 0.0 else r4(a.zip(b).map { case (x, y) => x * y }.sum / d)
      }
      var remaining = cs
      var selected = Vector.empty[(Long, Double)]
      var vecsSel = Vector.empty[Array[Double]]
      while (selected.size < k && remaining.nonEmpty) {
        val scored = remaining.map { c =>
          val red = if (vecsSel.isEmpty) 0.0 else vecsSel.map(cos(c._3, _)).max
          (c, r6(lam * c._2 - (1 - lam) * red))
        }
        val best = scored.minBy { case (c, s) => (-s, c._1) }
        selected :+= ((best._1._1, best._2))
        vecsSel :+= best._1._3
        remaining = remaining.filterNot(_._1 == best._1._1)
      }
      selected
    }
    val got = graft.SparkEntry.queries("doc_retrieval_mmr")(spark, GraftSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.groupBy(_._1).foreach { case (q, rows) =>
      val want = greedy(cands(q), 0.7, 5)
      val gotQ = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(gotQ == want, s"q=$q\n got $gotQ\nwant $want")
    }
    assert(got.nonEmpty)
  }
}
