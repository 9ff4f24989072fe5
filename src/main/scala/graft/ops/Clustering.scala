package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Textbook euclidean Lloyd k-means over an embedding column — the corpus
  * clustering primitive behind topic bucketing, cluster-balanced sampling,
  * and SemDeDup-style semantic grouping (Lloyd 1982; the SemDeDup paper's
  * clustering stage, Abbas et al. 2023).
  *
  * Deliberately distinct from [[Similarity.trainIvfCentroids]]: IVF training
  * assigns by max dot/|c| similarity (spherical, index-recall-oriented) and
  * re-packs empty clusters; this is the classic argmin-||x−c||² form with
  * stable cluster ids, whose every step is plain relational algebra an
  * external engine (the DuckDB oracle) reproduces exactly.
  */
object Clustering {

  /** Squared euclidean distance to a constant centroid, computed as
    * Σ(x_i−c_i)² IN DIMENSION ORDER via codegen'd higher-order functions —
    * the same expression the oracle writes, so both engines round
    * identically modulo summation order.
    */
  private def d2(vec: Column, cen: Array[Double]): Column =
    aggregate(
      zip_with(vec.cast("array<double>"), typedLit(cen), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)

  /** Adds `cluster` (index of the nearest centroid, ties → lowest index)
    * and `d2` (squared distance to it). Centroids ride the plan as literal
    * arrays — zero-Exchange, no crossJoin row amplification: each row
    * evaluates k codegen'd distance expressions and folds them with
    * `least` over (d2, index) structs.
    */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val best = centroids.indices
      .map(i => struct(d2(col(vecCol), centroids(i)).as("d2"), lit(i).as("cl")))
      .reduce(least(_, _))
    df.withColumn("__best", best)
      .withColumn("cluster", col("__best.cl"))
      .withColumn("d2", col("__best.d2"))
      .drop("__best")
  }

  /** `iters` Lloyd updates from a deterministic seed (the first k vectors
    * by `idCol` — no RNG), then a final assignment pass.
    *
    * Scale shape: assignment is map-side only (centroid literals, no
    * shuffle); the mean update is [[Vectors.CentroidAggregator]] — one
    * key shuffle of dim-sized partial-sum buffers per iteration, and the
    * driver holds only k×dim doubles of model state (same bounded-collect
    * family as the PQ/IVF codebook training). Empty clusters keep their
    * previous centroid; cluster ids are stable across iterations.
    *
    * Returns the input plus (cluster, d2) under the final centroids.
    */
  def lloyd(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var centroids: Array[Array[Double]] = df.orderBy(idCol).limit(k)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    val vecs = df.persist()
    (0 until iters).foreach { _ =>
      val assigned = assign(vecs, vecCol, centroids)
        .select(col("cluster"), col(vecCol).cast("array<float>"))
        .as[(Int, Array[Float])]
      val means = Vectors.centroids(assigned, dim).collect()
      val next = centroids.map(_.clone())
      means.foreach { case (cl, m) => next(cl) = m }
      centroids = next
    }
    val out = assign(vecs, vecCol, centroids)
    vecs.unpersist()
    out
  }
}
