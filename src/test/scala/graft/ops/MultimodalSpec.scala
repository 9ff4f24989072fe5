package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def mediaDf = Tables.documents(spark, GraftSpark.Sf0001)
    .limit(50)
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("decodeFeatures: schema grows by features array<float> of dim, deterministic") {
    val out = Multimodal.decodeFeatures(mediaDf, "payload", dim = 8)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "payload", "features"))
    val feats = out.orderBy("doc_id").select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length == 8))
    assert(feats.forall(_.forall(f => f >= 0.0f && f < 1.0f)))
    val again = Multimodal.decodeFeatures(mediaDf, "payload", dim = 8)
      .orderBy("doc_id").select("features").collect().map(_.getSeq[Float](0))
    assert(feats.toSeq == again.toSeq)
  }

  test("decodeFeatures matches a direct driver-side FakeDecoder call") {
    // first-principles check backing the pinned multimodal_decode oracle:
    // the distributed mapPartitions plumbing must reproduce a plain
    // driver-side invocation of the decoder on the UTF-8 payload bytes
    val docs = Tables.documents(spark, GraftSpark.Sf0001).filter(col("doc_id") < 50)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Multimodal.decodeFeatures(
      docs.select(col("doc_id"), col("text").cast("binary").as("payload")),
      "payload", dim = 8)
      .select("doc_id", "features").collect()
    assert(out.length == 50)
    out.foreach { r =>
      val want = Multimodal.FakeDecoder(8)(texts(r.getLong(0)).getBytes("UTF-8"))
      assert(r.getSeq[Float](1).toSeq == want.toSeq)
    }
  }

  test("decodeFeatures: null payloads yield null features") {
    val df = Seq((1L, "x"), (2L, null)).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val out = Multimodal.decodeFeatures(df, "payload", dim = 4).orderBy("id").collect()
    assert(out(0).getSeq[Float](2).length == 4)
    assert(out(1).isNullAt(2))
  }

  test("frameSample explodes n deterministic frames per payload") {
    val out = Multimodal.frameSample(mediaDf, "payload", "doc_id", n = 4)
    assert(out.count() == 200)
    assert(out.groupBy("doc_id").count().filter(col("count") =!= 4).isEmpty)
  }

  test("frameSample hashes match a driver-side xxhash64 recomputation") {
    // first-principles check backing the pinned multimodal_frames oracle:
    // frame_hash = xxhash64(payload, frame_idx) — seed-chained catalyst hash
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    val got = Multimodal.frameSample(mediaDf, "payload", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = mediaDf.select("doc_id", "payload").collect().flatMap { r =>
      val bytes = r.getAs[Array[Byte]](1)
      (0 until 3).map { i =>
        val h = XxHash64Function.hash(bytes, BinaryType, 42L)
        (r.getLong(0), i) -> XxHash64Function.hash(i, IntegerType, h)
      }
    }.toMap
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("withMediaMeta attaches the typed metadata struct") {
    val out = Multimodal.withMediaMeta(mediaDf, "payload",
      lit("png"), lit(64), lit(64), lit(0L))
    val meta = out.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.MediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("resize updates the metadata dimensions, payload untouched") {
    val withMeta = Multimodal.withMediaMeta(mediaDf, "payload", lit("png"), lit(256), lit(256), lit(0L))
    val resized = Multimodal.resize(withMeta, "payload", 64, 64)
    val r = resized.select("media_meta.width", "media_meta.height", "media_meta.format").head()
    assert((r.getInt(0), r.getInt(1), r.getString(2)) == (64, 64, "png"))
    assert(resized.select("payload").collect().toSeq == withMeta.select("payload").collect().toSeq)
    // no prior metadata: struct is created
    assert(Multimodal.resize(mediaDf, "payload", 32, 32)
      .select("media_meta.width").head().getInt(0) == 32)
  }

  test("decoded features feed straight into similarity search (pipeline composition)") {
    val feats = Multimodal.decodeFeatures(mediaDf, "payload", dim = 8)
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val topk = Similarity.bruteForceTopK(feats.filter(col("vec_id") < 3), feats,
      "vec_id", "embedding", k = 2)
    assert(topk.count() == 6)
  }
}
