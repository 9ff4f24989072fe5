package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def blob(center: Array[Float], ids: Range): Seq[(Long, Array[Float])] =
    ids.map(i => (i.toLong, center.zipWithIndex.map { case (c, j) =>
      c + ((i * 31 + j * 7) % 10) * 0.01f })) // tiny deterministic jitter

  test("separates two well-separated blobs regardless of seed membership") {
    // seeds are the first 2 by id: id 0 (blob A) and id 1 (blob A!) —
    // Lloyd must still pull one centroid over to blob B
    val a = blob(Array(0f, 0f, 0f), 0 until 10)
    val b = blob(Array(10f, 10f, 10f), 10 until 20)
    val out = Clustering.lloyd((a ++ b).toDF("id", "vec"), "id", "vec", k = 2, iters = 4)
      .select("id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val clustersA = (0 until 10).map(i => out(i.toLong)).toSet
    val clustersB = (10 until 20).map(i => out(i.toLong)).toSet
    assert(clustersA.size == 1 && clustersB.size == 1 && clustersA != clustersB)
  }

  test("assignment ties break to the lowest cluster index") {
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val out = Clustering.assign(
      Seq((1L, Array(0f, 5f))).toDF("id", "vec"), "vec", cents)
      .select("cluster").head().getInt(0)
    assert(out == 0) // equidistant from both centroids
  }

  test("empty clusters keep their previous centroid and ids stay stable") {
    // seeds are ids 1..3: c0=(0,0), c1=(0,0) duplicate, c2=(10,10).
    // Every origin point ties c0/c1 and breaks to c0, so c1 never wins a
    // point — it must survive unchanged (no NaN mean, no re-packing that
    // would renumber c2 to c1)
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(10f, 10f)), (4L, Array(10f, 10.1f))).toDF("id", "vec")
    val out = Clustering.lloyd(df, "id", "vec", k = 3, iters = 3)
      .select("id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 0 && out(2L) == 0)
    assert(out(3L) == 2 && out(4L) == 2) // id 2 NOT re-packed to 1
  }

  test("d2 of each point to its own centroid decreases inertia vs iteration 0") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array(((i * 13) % 7).toFloat, ((i * 29) % 5).toFloat)))
    val df = vecs.toDF("id", "vec")
    def inertia(iters: Int): Double =
      Clustering.lloyd(df, "id", "vec", k = 4, iters = iters)
        .agg(org.apache.spark.sql.functions.sum("d2")).head().getDouble(0)
    assert(inertia(4) <= inertia(0) + 1e-9) // Lloyd never increases inertia
  }

  test("centroid-distance pruning: ~10% per cluster, and pruned rows are the farthest") {
    import org.apache.spark.sql.functions._
    val emb = graft.etl.Tables.embeddings(spark, graft.GraftSpark.Sf0001)
    val assigned = Clustering.lloyd(emb, "vec_id", "embedding", k = 8, iters = 4)
      .select(col("vec_id"), col("cluster"), round(col("d2"), 4).as("d2r"))
      .localCheckpoint()
    val cuts = assigned.groupBy("cluster")
      .agg(round(percentile(col("d2r"), lit(0.9)), 4).as("cut"))
    val out = assigned.join(broadcast(cuts), Seq("cluster"))
      .withColumn("pruned", col("d2r") > col("cut"))
      .collect().map(r => (r.getInt(0 + 0), r.getLong(1), r.getDouble(2), r.getBoolean(4)))
    val n = out.length
    val pruneRate = out.count(_._4).toDouble / n
    assert(pruneRate > 0.05 && pruneRate < 0.15, s"global prune rate $pruneRate")
    // within each cluster: every pruned distance exceeds every kept one
    out.groupBy(_._1).foreach { case (cl, xs) =>
      val (p, k2) = xs.partition(_._4)
      if (p.nonEmpty && k2.nonEmpty)
        assert(p.map(_._3).min > k2.map(_._3).max, s"cluster $cl overlap")
      // per-cluster rate honors the p90 cut
      assert(p.length <= math.ceil(xs.length * 0.11), s"cluster $cl pruned ${p.length}/${xs.length}")
    }
  }
}
