package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class VectorsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("CentroidAggregator computes the element-wise mean per key") {
    val ds = Seq(
      (1, Array(1.0f, 2.0f)),
      (1, Array(3.0f, 4.0f)),
      (2, Array(10.0f, 20.0f))).toDS()
    val out = Vectors.centroids(ds, 2).collect().toMap
    assert(out(1).toSeq == Seq(2.0, 3.0))
    assert(out(2).toSeq == Seq(10.0, 20.0))
  }

  test("typed centroid matches untyped per-dimension avg on fixtures") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val typed = Vectors.centroids(
      emb.select(col("label"), col("embedding")).as[(Int, Array[Float])], 64)
      .toDF("label", "centroid")
      .select(col("label"), round(element_at(col("centroid"), 1), 6).as("c1"))
      .orderBy("label").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val untyped = emb.groupBy("label")
      .agg(round(avg(element_at(col("embedding"), 1)), 6).as("c1"))
      .orderBy("label").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(typed.toSeq == untyped.toSeq)
  }

  test("embeddingCosinePairs finds injected exact duplicates at cosine 1.0") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val dups = emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val pairs = Dedup.embeddingCosinePairs(emb.unionByName(dups), "vec_id", "embedding",
      threshold = 0.95, lshPlanes = 8).collect()
    assert(pairs.length == 10)
    assert(pairs.forall(_.getDouble(2) == 1.0))
  }
}
