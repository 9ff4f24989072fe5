package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the standard
  * dimensionality-reduction front end of embedding pipelines (whitening /
  * compaction before ANN indexing or clustering; e.g. the PCA step of
  * Jégou et al.'s IVFADC family).
  *
  * Scale shape (the only one that works at 100 TB):
  *
  *  1. [[fit]] makes ONE distributed pass computing the moment statistics
  *     (n, Σx, upper-triangular Σx·xᵀ) with a typed `Aggregator` — the
  *     buffer is d·(d+3)/2 doubles (d=64 → ~2 KB), combined map-side; no
  *     shuffle of vectors, no driver collect of data.
  *  2. The d×d covariance eigensolve runs on the DRIVER (cyclic Jacobi;
  *     d³ ≈ 260k flops for d=64 — not a distributed problem).
  *  3. [[project]] broadcasts the tiny model back as literals and computes
  *     k native codegen'd dot products per row — zero shuffle, the corpus
  *     is touched exactly once more.
  *
  * Covariance is the SAMPLE covariance (n−1 denominator). Eigenvectors are
  * sign-fixed (largest-|coordinate| entry made positive, first index on
  * ties) so the model — and every pinned projection downstream — is
  * reproducible across partitionings up to float-sum jitter.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (k rows × d, orthonormal,
    * descending eigenvalue), `explainedVariance` (k eigenvalues). */
  case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      explainedVariance: Array[Double])

  /** One-pass moment statistics: count, per-dim sum, and the packed
    * upper triangle of Σ x xᵀ (row-major, i ≤ j). */
  private[ops] class MomentAggregator(dim: Int)
      extends Aggregator[Array[Float], (Long, Array[Double], Array[Double]), (Long, Array[Double], Array[Double])] {
    private val tri = dim * (dim + 1) / 2

    override def zero: (Long, Array[Double], Array[Double]) =
      (0L, new Array[Double](dim), new Array[Double](tri))

    override def reduce(
        b: (Long, Array[Double], Array[Double]),
        v: Array[Float]): (Long, Array[Double], Array[Double]) = {
      require(v.length == dim, s"expected dim $dim, got ${v.length}")
      val (n, s, xx) = b
      var i = 0
      var t = 0
      while (i < dim) {
        val xi = v(i).toDouble
        s(i) += xi
        var j = i
        while (j < dim) {
          xx(t) += xi * v(j).toDouble
          t += 1
          j += 1
        }
        i += 1
      }
      (n + 1, s, xx)
    }

    override def merge(
        x: (Long, Array[Double], Array[Double]),
        y: (Long, Array[Double], Array[Double])): (Long, Array[Double], Array[Double]) = {
      var i = 0
      while (i < dim) { x._2(i) += y._2(i); i += 1 }
      i = 0
      while (i < tri) { x._3(i) += y._3(i); i += 1 }
      (x._1 + y._1, x._2, x._3)
    }

    override def finish(b: (Long, Array[Double], Array[Double])): (Long, Array[Double], Array[Double]) = b

    override def bufferEncoder: Encoder[(Long, Array[Double], Array[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Double], Array[Double])]()
    override def outputEncoder: Encoder[(Long, Array[Double], Array[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Double], Array[Double])]()
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix (full d×d, row-major).
    * Returns (eigenvalues, eigenvectors as rows), DESCENDING eigenvalue,
    * eigenvectors sign-fixed. Deterministic: fixed sweep order, fixed
    * rotation formulas, convergence at off(A) < 1e-11·scale.
    */
  private[ops] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300, a0.map(r => r.map(math.abs).max).max)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-11 * scale) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are eigenvectors; sort by eigenvalue descending
    // (stable: equal eigenvalues keep original column order)
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { ci =>
      val col = Array.tabulate(d)(r => v(r)(ci))
      // sign fix: make the largest-|coordinate| entry positive (first on tie)
      var mi = 0
      var i = 1
      while (i < d) { if (math.abs(col(i)) > math.abs(col(mi))) mi = i; i += 1 }
      if (col(mi) < 0) { i = 0; while (i < d) { col(i) = -col(i); i += 1 } }
      col
    }.toArray
    (vals, vecs)
  }

  /** Fit a k-component PCA on `vecCol` (array<float>, fixed dim). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    import df.sparkSession.implicits._
    val (n, s, xx) = df.select(col(vecCol)).as[Array[Float]]
      .select(new MomentAggregator(dim).toColumn)
      .head()
    require(n >= 2, s"PCA needs >= 2 rows, got $n")
    val mean = s.map(_ / n)
    // sample covariance from the packed moments:
    // cov(i,j) = (Σ x_i x_j − n μ_i μ_j) / (n − 1)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (xx(t) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    Model(mean, vecs.take(k), vals.take(k))
  }

  /** Project vectors onto the model's components: adds `outPrefix1..k`
    * columns, each the centered dot product (x − μ)·v_c — computed as the
    * native codegen'd dot minus the precomputed μ·v_c constant, so the
    * per-row cost is k primitive loops and the corpus never shuffles.
    */
  def project(df: DataFrame, vecCol: String, model: Model,
      outPrefix: String = "pc"): DataFrame = {
    val meanDots = model.components.map(c =>
      c.zip(model.mean).map { case (a, b) => a * b }.sum)
    model.components.zipWithIndex.foldLeft(df) { case (acc, (comp, ci)) =>
      acc.withColumn(s"$outPrefix${ci + 1}",
        graft.functions.VectorFunctions.vec_dot(
          col(vecCol), typedlit(comp.toSeq)) - lit(meanDots(ci)))
    }
  }
}
