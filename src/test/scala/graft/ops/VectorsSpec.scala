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

  test("quantizeInt8: max-|x| element maps to ±127, zero vector to scale 0, values clamped") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),   // maxabs 1.0 → scale 127
      (2L, Array(0.0f, 0.0f, 0.0f)))     // zero vector
      .toDF("vec_id", "embedding")
    val out = Vectors.quantizeInt8(df, "embedding").orderBy("vec_id").collect()
    assert(out(0).getAs[Double]("q_scale") == 127.0)
    assert(out(0).getSeq[Int](out(0).fieldIndex("q_vec")).toList == List(64, -127, 32))
    assert(out(1).getAs[Double]("q_scale") == 0.0)
    assert(out(1).getSeq[Int](out(1).fieldIndex("q_vec")).toList == List(0, 0, 0))
  }

  test("quantizeInt8 on fixtures: quantized cosine rankings track float rankings") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001).filter(col("vec_id") < 50)
    val q = Vectors.quantizeInt8(emb, "embedding")
    val rows = q.select("vec_id", "embedding", "q_vec", "q_scale").collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val f = rows.map(r => r.getLong(0) ->
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val iq = rows.map(r => r.getLong(0) ->
      r.getAs[Seq[Int]]("q_vec").map(_.toDouble).toArray).toMap
    // quantization error on cosine should be small (< 0.01 for 64-dim int8)
    val errs = for (a <- f.keys; b <- f.keys if a < b)
      yield math.abs(cos(f(a), f(b)) - cos(iq(a), iq(b)))
    assert(errs.max < 0.01, s"int8 cosine drift ${errs.max}")
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
