package graft.ops

import org.apache.spark.sql.Row
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

  test("ImageIODecoder mean-pools luminance into the grid (crafted 2-band image)") {
    // 4×4 image: top two rows black, bottom two rows white → grid 2 gives
    // exactly [0, 0, 1, 1]
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (y < 2) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val feats = Multimodal.ImageIODecoder(2)(buf.toByteArray)
    assert(feats.toSeq == Seq(0f, 0f, 1f, 1f))
  }

  test("ImageIODecoder is format-agnostic across JRE codecs (png/bmp agree)") {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, (x * 32) << 16 | (y * 32))
    def enc(fmt: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, b)
      b.toByteArray
    }
    // both losslessly encode 24-bit RGB → identical decoded features
    assert(Multimodal.ImageIODecoder(4)(enc("png")).toSeq ==
      Multimodal.ImageIODecoder(4)(enc("bmp")).toSeq)
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIODecoder(4)("not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("decodable"))
  }

  test("decodeFeaturesAuto dispatches: png and wav rows both decode for real") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001).filter(col("doc_id") < 20)
    val media = Multimodal.synthesizeMixedPayloads(
      docs.select(col("doc_id"), col("text")), "doc_id", "text")
    val out = Multimodal.decodeFeaturesAuto(media, "payload", "format", dim = 64)
      .select("doc_id", "format", "features").collect()
    assert(out.length == 20)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(r.getString(1) == "png")
        val want = Multimodal.ImageIODecoder(8)(Multimodal.syntheticPng(id))
        assert(r.getSeq[Float](2).toSeq == want.toSeq)
      } else {
        assert(r.getString(1) == "wav")
        val want = Multimodal.WavPcmDecoder(64)(Multimodal.syntheticWav(id))
        assert(r.getSeq[Float](2).toSeq == want.toSeq)
      }
    }
  }

  /** Hand-build a RIFF/WAVE PCM16 payload with explicit samples. */
  private def wavBytes(samples: Seq[Seq[Short]], channels: Int): Array[Byte] = {
    val dataLen = samples.length * 2 * channels
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(8000).putInt(8000 * 2 * channels).putShort((2 * channels).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(frame => frame.foreach(buf.putShort))
    buf.array()
  }

  test("WavPcmDecoder mean-pools |amplitude| into time bins (crafted clip)") {
    // 4 mono frames at half/quarter scale → dim 2 gives exactly the two
    // bin means: [(0.5+0.5)/2, (0.25+0.25)/2] = [0.5, 0.25]
    val clip = wavBytes(Seq(Seq(16384), Seq(-16384), Seq(8192), Seq(-8192))
      .map(_.map(_.toShort)), channels = 1)
    assert(Multimodal.WavPcmDecoder(2)(clip).toSeq == Seq(0.5f, 0.25f))
    // shorter than dim: trailing bins are 0
    val one = wavBytes(Seq(Seq(16384.toShort)), channels = 1)
    assert(Multimodal.WavPcmDecoder(4)(one).toSeq == Seq(0.5f, 0f, 0f, 0f))
  }

  test("WavPcmDecoder averages channels per frame and rejects bad payloads") {
    // stereo frame (1000, 3000) → mean 2000 → |2000|/32768
    val stereo = wavBytes(Seq(Seq(1000.toShort, 3000.toShort)), channels = 2)
    assert(Multimodal.WavPcmDecoder(1)(stereo).toSeq == Seq((2000.0 / 32768.0).toFloat))
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.WavPcmDecoder(4)("definitely not audio bytes".getBytes("UTF-8"))
    }
    assert(e1.getMessage.contains("RIFF"))
    // 8-bit PCM (bits=8) must be rejected, not misread
    val bad = wavBytes(Seq(Seq(0.toShort)), channels = 1)
    bad(34) = 8 // bitsPerSample byte
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.WavPcmDecoder(4)(bad)
    }
    assert(e2.getMessage.contains("16-bit"))
  }

  test("syntheticWav round-trips through the decoder deterministically") {
    val a = Multimodal.WavPcmDecoder(16)(Multimodal.syntheticWav(7L))
    val b = Multimodal.WavPcmDecoder(16)(Multimodal.syntheticWav(7L))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f >= 0f && f <= 1f))
    // different seeds → different clips (mixing actually varies samples)
    assert(a.toSeq != Multimodal.WavPcmDecoder(16)(Multimodal.syntheticWav(8L)).toSeq)
  }

  test("resizeImages: real nearest-neighbor resample, non-image payloads pass through") {
    // 2×2 quadrant image upscaled to 4×4 must replicate each quadrant pixel
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xffffff); img.setRGB(1, 1, 0x000000)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val df = Seq(
      (1L, buf.toByteArray, "png"),
      (2L, "audio bytes".getBytes("UTF-8"), "wav")
    ).toDF("id", "payload", "format")
    val out = Multimodal.resizeImages(df, "payload", "format", 4, 4)
      .orderBy("id").collect()
    // decoded features of the resized image = the checkerboard at grid 2
    val resized = out(0).getAs[Array[Byte]](1)
    assert(Multimodal.ImageIODecoder(2)(resized).toSeq == Seq(0f, 1f, 1f, 0f))
    // metadata updated on both rows; non-image payload untouched
    assert(out.map(_.getAs[Row]("media_meta").getInt(1)).toSeq == Seq(4, 4))
    assert(out(1).getAs[Array[Byte]](1).toSeq == "audio bytes".getBytes("UTF-8").toSeq)
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

  test("averageHash matches a driver-side recomputation on decoded images") {
    val ids = spark.range(0, 6).select(col("id").as("doc_id"))
    val hashed = Multimodal.averageHash(
      Multimodal.decodeFeatures(Multimodal.synthesizeWaveImages(ids, "doc_id"),
        "payload", decoder = Multimodal.ImageIODecoder(8)),
      "features", "phash")
    hashed.select("doc_id", "features", "phash").collect().foreach { r =>
      val f = r.getSeq[Float](1)
      val mean = f.map(_.toDouble).sum / f.length
      val want = f.zipWithIndex.map { case (v, i) =>
        if (v.toDouble > mean) 1L << i else 0L }.reduce(_ | _)
      assert(r.getLong(2) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("averageHash is invariant under exact 2x nearest-neighbor upscale") {
    // 2x NN upscale duplicates each pixel into a 2x2 block, so 8x8 grid
    // pooling averages the same source pixels -> identical hash
    val ids = spark.range(0, 8).select(col("id").as("doc_id"))
    val imgs = Multimodal.synthesizeWaveImages(ids, "doc_id")
    val up = Multimodal.resizeImages(imgs, "payload", "format", 64, 64)
    def hashes(df: org.apache.spark.sql.DataFrame) =
      Multimodal.averageHash(
        Multimodal.decodeFeatures(df, "payload", decoder = Multimodal.ImageIODecoder(8)),
        "features", "phash")
        .select("doc_id", "phash").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(imgs) == hashes(up))
  }

  test("phash near-dup mining: hamming<=3 clone pairs are ALWAYS recovered " +
    "(banding pigeonhole), overall clone recovery is high") {
    val ids = spark.range(0, 40).select((col("id") * 2).as("doc_id"))
    val imgs = Multimodal.synthesizeWaveImages(ids, "doc_id")
    val clones = Multimodal.resizeImages(imgs, "payload", "format", 28, 28)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val all = imgs.unionByName(clones.select(imgs.columns.map(col): _*))
    val hashed = Multimodal.averageHash(
      Multimodal.decodeFeatures(all, "payload", decoder = Multimodal.ImageIODecoder(8)),
      "features", "phash")
    val fps = hashed.select("doc_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val found = Dedup.fingerprintPairs(hashed, "doc_id", "phash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trueHamming = (0 until 40).map { i =>
      val id = i * 2L
      id -> java.lang.Long.bitCount(fps(id) ^ fps(id + 1000000L))
    }
    // pigeonhole guarantee: hamming<=3 implies one clean 16-bit band
    trueHamming.filter(_._2 <= 3).foreach { case (id, hd) =>
      assert(found.contains((id, id + 1000000L)), s"id $id hamming $hd missed")
    }
    val recovered = trueHamming.count { case (id, hd) =>
      hd <= 6 && found.contains((id, id + 1000000L)) }
    val eligible = trueHamming.count(_._2 <= 6)
    assert(eligible > 20, s"resample perturbed too much: only $eligible <= 6")
    // banding recall above hamming 3 is probabilistic (a 4–6-bit flip can
    // touch all four bands) — assert a floor, not perfection
    assert(recovered >= (eligible * 6) / 10, s"$recovered of $eligible recovered")

    // duplicate input ids must never surface as self-pairs (the sorted
    // slice pairing only guarantees id_a <= id_b)
    val withDup = hashed.unionByName(hashed.limit(3))
    val dupPairs = Dedup.fingerprintPairs(withDup, "doc_id", "phash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dupPairs.forall { case (a, b) => a != b }, "self-pair leaked")
  }

  test("syntheticAvi round-trips through parseAvi with the declared geometry") {
    val bytes = Multimodal.syntheticAvi(7L, w = 6, h = 4, nFrames = 5)
    val layout = Multimodal.parseAvi(bytes)
    assert(layout.width == 6 && layout.height == 4)
    assert(layout.frameOffsets.length == 5)
    assert(layout.stride == 20) // 6*3=18 rounded up to the 4-byte boundary
    // per-frame mean luminance ramps strictly with the frame index (the
    // synthesis contract that makes frames distinguishable)
    val lumas = layout.frameOffsets.indices.map(f =>
      Multimodal.aviFrameMeanLuma(bytes, layout, f))
    assert(lumas.zip(lumas.tail).forall { case (a, b) => a < b }, s"not a ramp: $lumas")
    assert(lumas.forall(l => l >= 0.0 && l <= 1.0))
  }

  test("AviDibDecoder via the auto dispatcher matches a driver-side byte recomputation") {
    import spark.implicits._
    val ids = Seq(3L, 4L).toDF("doc_id")
    val media = Multimodal.synthesizeAviPayloads(ids, "doc_id")
    val got = Multimodal.decodeFeaturesAuto(media, "payload", "format", dim = 9)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    Seq(3L, 4L).foreach { id =>
      val bytes = Multimodal.syntheticAvi(id)
      val layout = Multimodal.parseAvi(bytes)
      val n = layout.frameOffsets.length
      val sums = new Array[Double](9)
      val counts = new Array[Int](9)
      (0 until n).foreach { f =>
        sums(f * 9 / n) += Multimodal.aviFrameMeanLuma(bytes, layout, f)
        counts(f * 9 / n) += 1
      }
      val want = (0 until 9).map(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat).toVector
      assert(got(id) == want, s"id $id")
    }
  }

  test("syntheticMjpgAvi parses as MJPG despite the audio strl coming first") {
    val bytes = Multimodal.syntheticMjpgAvi(5L, w = 16, h = 16, nFrames = 6)
    val layout = Multimodal.parseAvi(bytes)
    assert(layout.codec == "mjpg")
    assert(layout.width == 16 && layout.height == 16)
    assert(layout.frameOffsets.length == 6)
    // every frame chunk is a standalone baseline JPEG (SOI marker)
    layout.frameOffsets.foreach { off =>
      assert((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8,
        s"frame at $off is not a JPEG")
    }
    // frame means ramp with the index and survive the lossy round-trip
    val lumas = layout.frameOffsets.indices.map(f =>
      Multimodal.aviFrameMeanLuma(bytes, layout, f))
    assert(lumas.zip(lumas.tail).forall { case (a, b) => a < b }, s"not a ramp: $lumas")
    // lossy JPEG still lands near the synthesis base level base/255 ± noise
    lumas.zipWithIndex.foreach { case (l, f) =>
      val base = (32 + (f * 160) / 5) / 255.0
      assert(math.abs(l - base) < 0.05, s"frame $f luma $l far from base $base")
    }
  }

  test("MJPEG frames decode through the dispatcher identically to a driver-side ImageIO pass") {
    import spark.implicits._
    val media = Multimodal.synthesizeMjpgPayloads(Seq(9L).toDF("doc_id"), "doc_id")
    val got = Multimodal.frameSampleVideo(media, "payload", "doc_id", n = 3)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4)))
    val bytes = Multimodal.syntheticMjpgAvi(9L)
    val layout = Multimodal.parseAvi(bytes)
    assert(got.map(_._1).toSeq == Seq(0, 1, 2))
    got.foreach { case (_, frameNo, luma, hash) =>
      val want = math.round(
        Multimodal.aviFrameMeanLuma(bytes, layout, frameNo) * 10000).toDouble / 10000
      assert(luma == want, s"frame $frameNo luma")
      val off = layout.frameOffsets(frameNo)
      var h = 1125899906842597L
      (off until off + layout.frameSizes(frameNo)).foreach(p => h = 31 * h + (bytes(p) & 0xff))
      assert(hash == h, s"frame $frameNo hash")
    }
  }

  test("parseAvi rejects a short DIB frame chunk instead of reading past it") {
    val bytes = Multimodal.syntheticAvi(3L, w = 6, h = 4, nFrames = 2)
    val layout = Multimodal.parseAvi(bytes)
    // shrink the LAST frame chunk's declared size below stride*height
    // (last, so the walk still reaches the end aligned): the parse must
    // fail loudly, not let luma reads run past the chunk
    val broken = bytes.clone()
    val chunkHdr = layout.frameOffsets.last - 8
    val small = layout.stride * layout.height - 4
    broken(chunkHdr + 4) = (small & 0xff).toByte
    broken(chunkHdr + 5) = ((small >> 8) & 0xff).toByte
    broken(chunkHdr + 6) = 0; broken(chunkHdr + 7) = 0
    val e = intercept[IllegalArgumentException](Multimodal.parseAvi(broken))
    assert(e.getMessage.contains("stride*height"), e.getMessage)
  }

  test("frameSampleVideo samples evenly-spaced REAL frames; corrupt payloads throw") {
    import spark.implicits._
    val media = Multimodal.synthesizeAviPayloads(Seq(11L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.frameSampleVideo(media, "payload", "doc_id", n = 4)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(rows.map(_._2).toSeq == Seq(0, 3, 6, 9)) // 12 frames, stride 3
    val lumas = rows.map(_._3)
    assert(lumas.zip(lumas.tail).forall { case (a, b) => a < b })
    // a non-AVI payload must fail loudly, not fake-decode
    val junk = Seq((1L, "not a video".getBytes("UTF-8"))).toDF("doc_id", "payload")
    intercept[Exception] {
      Multimodal.frameSampleVideo(junk, "payload", "doc_id", n = 2).collect()
    }
  }
}
