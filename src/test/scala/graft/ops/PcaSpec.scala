package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class PcaSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("2-d hand case: components align with the dominant axis") {
    // points on the line y = 2x plus tiny orthogonal noise
    val pts = Seq.tabulate(40) { i =>
      val t = (i - 20).toDouble / 4
      Array((t + 0.01 * (i % 3 - 1)).toFloat, (2 * t - 0.005 * (i % 5 - 2)).toFloat)
    }.toDF("v")
    val m = Pca.fit(pts, "v", dim = 2, k = 2)
    // first component ~ (1,2)/sqrt5, sign-fixed positive on its largest coord
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(1) / c0(0)) - 2.0) < 0.05)
    assert(c0(1) > 0) // largest-|coord| entry positive
    assert(m.explainedVariance(0) > 100 * m.explainedVariance(1))
  }

  test("moments/eigensolve against driver brute force on real embeddings") {
    val emb = graft.etl.Tables.embeddings(spark, GraftSpark.Sf0001).limit(120)
    val vecs = emb.select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val d = vecs.head.length
    val n = vecs.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
    }
    val m = Pca.fit(emb, "embedding", dim = d, k = 6)
    // mean matches
    m.mean.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // each component is a unit eigenvector of the brute-force covariance:
    // ||C v − λ v|| small
    m.components.zip(m.explainedVariance).foreach { case (v, lam) =>
      assert(math.abs(dot(v, v) - 1.0) < 1e-9, "unit norm")
      val cv = Array.tabulate(d)(i => dot(cov(i), v))
      val resid = math.sqrt(cv.zip(v).map { case (a, b) => (a - lam * b) * (a - lam * b) }.sum)
      assert(resid < 1e-7 * math.max(1.0, math.abs(lam)), s"eigenpair residual $resid")
    }
    // descending variance, pairwise orthogonal
    m.explainedVariance.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-12))
    for (i <- m.components.indices; j <- 0 until i)
      assert(math.abs(dot(m.components(i), m.components(j))) < 1e-9)
  }

  test("project matches driver-side (x - mean)·v and preserves total variance at k=d") {
    val emb = graft.etl.Tables.embeddings(spark, GraftSpark.Sf0001).limit(80)
    val d = 64
    val m = Pca.fit(emb, "embedding", dim = d, k = d)
    val proj = Pca.project(emb, "embedding", m)
    val rows = proj.select(col("vec_id"), col("embedding"),
      array((1 to d).map(i => col(s"pc$i")): _*).as("p")).collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](1).toArray.map(_.toDouble)
      val p = r.getSeq[Double](2).toArray
      m.components.zipWithIndex.foreach { case (v, i) =>
        val want = dot(x.zip(m.mean).map { case (a, b) => a - b }, v)
        assert(math.abs(p(i) - want) < 1e-8, s"row ${r.getLong(0)} pc${i + 1}")
      }
    }
    // rotation preserves variance: Σ var(pc_i) == trace of covariance
    val nn = rows.length.toDouble
    val totalProj = (0 until d).map { i =>
      val c = rows.map(_.getSeq[Double](2)(i))
      val mu = c.sum / nn
      c.map(v => (v - mu) * (v - mu)).sum / (nn - 1)
    }.sum
    val totalVar = m.explainedVariance.sum
    assert(math.abs(totalProj - totalVar) / totalVar < 1e-9)
  }

  test("guards: k bounds and minimum rows") {
    val tiny = Seq(Array(1f, 2f)).toDF("v")
    intercept[IllegalArgumentException](Pca.fit(tiny, "v", dim = 2, k = 3))
    intercept[IllegalArgumentException](Pca.fit(tiny, "v", dim = 2, k = 1))
  }
}
