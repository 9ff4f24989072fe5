package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star surface, BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata; decode / feature-extract run per partition in batches.
  *
  * IMAGE payloads decode for REAL: the JVM ships codecs for
  * PNG/JPEG/GIF/BMP/WBMP/TIFF via `javax.imageio`, and [[ImageIODecoder]]
  * turns a payload into normalized mean-pooled luminance features with no
  * external dependency. AUDIO payloads decode for REAL too:
  * [[WavPcmDecoder]] parses RIFF/WAVE PCM by hand (the container is a
  * plain chunked byte layout — no codec needed for uncompressed PCM) and
  * mean-pools absolute amplitude into time bins. VIDEO payloads have no
  * JRE codec and no hand-parseable uncompressed layout, so they route to
  * the clearly-marked deterministic [[FakeDecoder]] stand-in;
  * [[decodeFeaturesAuto]] dispatches per row on the format column — the
  * mixed-modality corpus shape. The Spark-side plumbing — schema
  * evolution, partition-batched execution, binary handling — is shared by
  * all branches, and a real video decoder drops in as another
  * `Array[Byte] => Array[Float]` with zero plan changes.
  *
  * Scale notes: `mapPartitions` keeps per-record decoder state initialized
  * once per partition, not per row; binary payloads never pass through the
  * driver; feature arrays stay columnar downstream. Skewed payload sizes →
  * repartition upstream by a size-bucket column.
  */
object Multimodal {

  // executor-side: never spill decode scratch to disk-cache temp files
  ImageIO.setUseCache(false)

  /** Image formats the JRE decodes natively (ImageIO reader set). */
  val ImageFormats: Set[String] =
    Set("png", "jpg", "jpeg", "gif", "bmp", "wbmp", "tif", "tiff")

  /** Audio container formats [[WavPcmDecoder]] parses by hand. */
  val AudioFormats: Set[String] = Set("wav")

  /** STUB decoder for payload types with NO codec in the JRE and no
    * hand-parseable uncompressed layout (video): deterministic fake
    * features from a rolling byte hash. Image payloads decode via
    * [[ImageIODecoder]], WAV audio via [[WavPcmDecoder]] (or the
    * [[decodeFeaturesAuto]] dispatch). Replace with a real video frame
    * extractor at deployment.
    */
  def FakeDecoder(dim: Int)(bytes: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    Array.tabulate(dim) { d =>
      val x = h ^ (d.toLong * 0x9e3779b97f4a7c15L)
      val mixed = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      ((mixed >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** REAL image decoder (JRE `javax.imageio` — PNG/JPEG/GIF/BMP/TIFF):
    * decodes the payload and mean-pools per-pixel luminance
    * ((r + g + b) / 3·255) into a `grid`×`grid` cell matrix, row-major —
    * `grid²` features in [0, 1]. Deterministic: pooling is explicit
    * double-precision arithmetic over `getRGB` sRGB values (no
    * Graphics2D scaler, whose interpolation is implementation-defined).
    * Cells that receive no pixels (image narrower than the grid) are 0.
    * Throws on an undecodable payload — dispatch non-image formats to
    * their own decoder via [[decodeFeaturesAuto]].
    */
  def ImageIODecoder(grid: Int)(bytes: Array[Byte]): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a JRE-decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Int](grid * grid)
    var y = 0
    while (y < h) {
      val gy = y * grid / h
      var x = 0
      while (x < w) {
        val gx = x * grid / w
        val rgb = img.getRGB(x, y)
        val lum =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
        val c = gy * grid + gx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid) { i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat
    }
  }

  /** REAL audio decoder — hand-parsed RIFF/WAVE, uncompressed PCM 16-bit:
    * walks the chunk list (`fmt ` + `data`, tolerating extra chunks like
    * `LIST`), averages channels per frame, and mean-pools the absolute
    * normalized amplitude (|s| / 32768) of each frame into `dim`
    * evenly-spaced time bins — the 1-D analogue of [[ImageIODecoder]]'s
    * luminance grid, features in [0, 1]. Pure byte arithmetic: no
    * `javax.sound` (which needs an audio system) and no external codec —
    * uncompressed PCM needs none. Deterministic everywhere. Bins past the
    * last frame (clip shorter than `dim` frames) are 0. Throws on a
    * non-RIFF payload, compressed/non-16-bit encodings, or a missing
    * `data` chunk.
    */
  def WavPcmDecoder(dim: Int)(bytes: Array[Byte]): Array[Float] = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "payload is not a RIFF/WAVE file")
    var pos = 12
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = tag(pos)
      val size = u32(pos + 4).toInt
      require(size >= 0 && pos + 8 + size <= bytes.length, s"truncated WAV chunk '$id'")
      if (id == "fmt ") {
        require(size >= 16, "malformed fmt chunk")
        val audioFormat = u16(pos + 8)
        require(audioFormat == 1, s"only uncompressed PCM supported (audioFormat=$audioFormat)")
        channels = u16(pos + 10)
        require(channels >= 1, s"bad channel count $channels")
        val bits = u16(pos + 22)
        require(bits == 16, s"only 16-bit PCM supported (bits=$bits)")
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = size
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned (odd sizes pad)
    }
    require(channels > 0, "WAV has no fmt chunk before data ended")
    require(dataOff >= 0, "WAV has no data chunk")
    val frameBytes = 2 * channels
    val nFrames = dataLen / frameBytes
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var f = 0
    while (f < nFrames) {
      val bin = f * dim / nFrames
      var acc = 0.0
      var c = 0
      while (c < channels) {
        val raw = u16(dataOff + f * frameBytes + 2 * c).toShort
        acc += raw
        c += 1
      }
      sums(bin) += math.abs(acc / channels) / 32768.0
      counts(bin) += 1
      f += 1
    }
    Array.tabulate(dim) { i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat
    }
  }

  /** Deterministic synthetic WAV (fixture generator for the audio leg):
    * a genuine RIFF/WAVE PCM16 mono file whose samples are a
    * SplitMix-style mix of (seed, i) — parse + decode is bit-exact
    * everywhere, so features derived from these clips are pinnable oracle
    * values, exactly like [[syntheticPng]].
    */
  def syntheticWav(seed: Long, nSamples: Int = 2048, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                  // PCM
      .putShort(1)                  // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)       // byte rate
      .putShort(2)                  // block align
      .putShort(16)                 // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      var z = seed ^ (i * 0x9e3779b97f4a7c15L)
      z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
      z ^= z >>> 29
      buf.putShort((z & 0xffff).toShort)
      i += 1
    }
    buf.array()
  }

  /** Attach a `features: array<float>` column by running `decoder` over the
    * binary column, partition-batched. Schema-preserving plus one column.
    */
  def decodeFeatures(
      df: DataFrame,
      binCol: String,
      dim: Int = 8,
      decoder: Array[Byte] => Array[Float] = null): DataFrame = {
    val dec = if (decoder == null) FakeDecoder(dim) _ else decoder
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // decoders with native state init HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val feats = if (bytes == null) null else dec(bytes)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Format-dispatched decode over a MIXED-modality frame: rows whose
    * `formatCol` is a JRE image format ([[ImageFormats]]) decode for real
    * via [[ImageIODecoder]], WAV rows decode for real via
    * [[WavPcmDecoder]]; everything else (video — no JRE codec) takes the
    * [[FakeDecoder]] stand-in. One partition-batched pass, decoders
    * initialized once per partition; `dim` must be a perfect square (the
    * image grid is `√dim`×`√dim`; audio uses `dim` time bins).
    */
  def decodeFeaturesAuto(
      df: DataFrame,
      binCol: String,
      formatCol: String,
      dim: Int = 64): DataFrame = {
    val grid = math.sqrt(dim).toInt
    require(grid * grid == dim, s"dim must be a perfect square: $dim")
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val fmtIdx = df.schema.fieldIndex(formatCol)
    df.mapPartitions { rows =>
      val image = ImageIODecoder(grid) _
      val audio = WavPcmDecoder(dim) _
      val stub = FakeDecoder(dim) _
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val fmt = if (r.isNullAt(fmtIdx)) "" else r.getString(fmtIdx).toLowerCase
        val feats =
          if (bytes == null) null
          else if (ImageFormats.contains(fmt)) image(bytes)
          else if (AudioFormats.contains(fmt)) audio(bytes)
          else stub(bytes)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic synthetic PNG (fixture generator for the image leg):
    * every pixel's RGB is a SplitMix-style mix of (seed, x, y), losslessly
    * PNG-encoded — decode is bit-exact everywhere, so features derived
    * from these images are pinnable oracle values.
    */
  def syntheticPng(seed: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = seed ^ (x * 0x9e3779b97f4a7c15L) ^ (y * 0xc2b2ae3d27d4eb4fL)
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        z ^= z >>> 29
        img.setRGB(x, y, (z & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic mixed-modality payload synthesis over an id + text
    * frame — the fixture shape for [[decodeFeaturesAuto]]: even ids carry
    * a [[syntheticPng]] seeded by the id (real image decode path); odd
    * ids carry a genuine [[syntheticWav]] PCM clip seeded by the id (real
    * audio decode path). Executor-side generation (mapPartitions) — no
    * payload ever crosses the driver. (`textCol` is retained in the
    * output frame; it seeds nothing since both payloads derive from the
    * id alone.)
    */
  def synthesizeMixedPayloads(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val outSchema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("format", StringType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val (payload, fmt) =
          if (id % 2 == 0) (syntheticPng(id), "png")
          else (syntheticWav(id), "wav")
        Row.fromSeq(r.toSeq :+ payload :+ fmt)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image resize for JRE-decodable payloads: deterministic
    * nearest-neighbor resample (explicit index arithmetic — no Graphics2D
    * interpolation) re-encoded as PNG, with `media_meta` updated; rows
    * whose `formatCol` is not a JRE image format pass their payload
    * through untouched (their resize belongs to the codec that can decode
    * them) and only the metadata updates. Partition-batched like the
    * decoders.
    */
  def resizeImages(
      df: DataFrame,
      binCol: String,
      formatCol: String,
      width: Int,
      height: Int): DataFrame = {
    require(width >= 1 && height >= 1, s"bad target size: ${width}x$height")
    val withMeta = resize(df, binCol, width, height)
    val outSchema = withMeta.schema
    val binIdx = withMeta.schema.fieldIndex(binCol)
    val fmtIdx = withMeta.schema.fieldIndex(formatCol)
    withMeta.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val fmt = if (r.isNullAt(fmtIdx)) "" else r.getString(fmtIdx).toLowerCase
        val out =
          if (bytes == null || !ImageFormats.contains(fmt)) r.toSeq
          else {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            require(img != null, "payload is not a JRE-decodable image")
            val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < height) {
              val sy = y * img.getHeight / height
              var x = 0
              while (x < width) {
                dst.setRGB(x, y, img.getRGB(x * img.getWidth / width, sy) & 0xffffff)
                x += 1
              }
              y += 1
            }
            val buf = new ByteArrayOutputStream()
            ImageIO.write(dst, "png", buf)
            r.toSeq.updated(binIdx, buf.toByteArray)
          }
        Row.fromSeq(out)
      }
    }(Encoders.row(outSchema))
  }

  /** Metadata-only resize: the payload passes through and the metadata
    * struct is updated — the schema contract downstream operators rely on
    * when the payload's codec lives elsewhere (audio/video). For image
    * payloads [[resizeImages]] resamples the pixels for real.
    */
  def resize(df: DataFrame, binCol: String, width: Int, height: Int): DataFrame = {
    val hasMeta = df.columns.contains("media_meta")
    val base = if (hasMeta) df else df.withColumn("media_meta",
      struct(lit(null).cast("string").as("format"), lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"), lit(null).cast("bigint").as("duration_ms")))
    base.withColumn("media_meta",
      struct(col("media_meta.format").as("format"), lit(width).as("width"),
        lit(height).as("height"), col("media_meta.duration_ms").as("duration_ms")))
  }

  /** Pseudo frame-sampling: explode `n` evenly-spaced "frames" per payload
    * (STUB: frame content is a deterministic slice hash — video codecs
    * have no JRE decoder; a real implementation samples actual video
    * frames). Output: one row per frame with `frame_idx` and `frame_hash`.
    */
  def frameSample(df: DataFrame, binCol: String, idCol: String, n: Int): DataFrame =
    df.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => xxhash64(col(binCol), i))).as(Seq("frame_idx", "frame_hash")))

  /** Typed metadata block for an opaque media column (schema surface for
    * the multimodal table shape: payload + metadata travel together).
    */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a binary column with a metadata struct (values supplied as
    * columns), yielding the canonical multimodal column pair.
    */
  def withMediaMeta(df: DataFrame, binCol: String,
      format: org.apache.spark.sql.Column,
      width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column,
      durationMs: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("media_meta",
      struct(format.as("format"), width.as("width"), height.as("height"),
        durationMs.as("duration_ms")))

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic SMOOTH synthetic PNG: a low-frequency cosine-mixture
    * luminance field, `lum(x,y) = 127.5·(1 + cos(2πfx·x/w + px)·cos(2πfy·y/h + py))`
    * with seed-derived integer frequencies (1–3 cycles) and phases. Unlike
    * [[syntheticPng]] (per-pixel noise, whose pooled cells all sit at the
    * global mean and flip average-hash bits under any resample), this has
    * the coarse structure perceptual hashing is designed for: grid-pooled
    * luminance — and therefore [[averageHash]] — is stable under
    * nearest-neighbor resizing. Pure arithmetic + lossless PNG: bit-exact
    * everywhere.
    */
  def syntheticWavePng(seed: Long, w: Int = 32, h: Int = 32): Array[Byte] = {
    // two additive cosine components (frequencies 1–4, independent phases,
    // seed-varied mix weight): rich enough that distinct seeds rarely
    // share an aHash sign pattern, smooth enough that resampled clones do
    def p(i: Long): Double = ((mix64(seed + i) & 0x7fffffffL) % 6283) / 1000.0
    def f(i: Long): Long = 1 + (mix64(seed + i) & 0x7fffffffL) % 4
    val (fx1, fy1, px1, py1) = (f(0), f(1), p(2), p(3))
    val (fx2, fy2, px2, py2) = (f(4), f(5), p(6), p(7))
    val w2 = 0.3 + ((mix64(seed + 8) & 0x7fffffffL) % 1000) / 2500.0 // 0.3–0.7
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c1 = math.cos(2 * math.Pi * fx1 * x / w + px1) *
          math.cos(2 * math.Pi * fy1 * y / h + py1)
        val c2 = math.cos(2 * math.Pi * fx2 * x / w + px2) *
          math.cos(2 * math.Pi * fy2 * y / h + py2)
        val v = (1 - w2) * c1 + w2 * c2
        val lum = math.max(0, math.min(255, (127.5 * (1 + v)).toInt))
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Executor-side [[syntheticWavePng]] payload synthesis over an id frame
    * (fixture shape for the perceptual-hash dedup path — payloads never
    * cross the driver). Adds `payload` (binary) + `format` ("png").
    */
  def synthesizeWaveImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("format", StringType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ syntheticWavePng(r.getLong(idIdx)) :+ "png"))
    }(Encoders.row(outSchema))
  }

  /** Average-hash (aHash) perceptual fingerprint over a decoded feature
    * vector: bit i is set iff feature i exceeds the vector's mean —
    * with [[ImageIODecoder]]'s 8×8 luminance grid this is the classic
    * 64-bit aHash. Pure codegen'd HOF arithmetic, shuffle-free; feed the
    * result to [[Dedup.fingerprintPairs]] for banded near-dup mining.
    * Requires ≤ 64 features.
    */
  def averageHash(df: DataFrame, featuresCol: String, outCol: String): DataFrame =
    df.withColumn("__ah_mean",
        expr(s"aggregate($featuresCol, 0D, (a, x) -> a + cast(x as double))") /
          size(col(featuresCol)))
      .withColumn(outCol, expr(
        s"aggregate(zip_with($featuresCol, sequence(0, size($featuresCol) - 1), " +
          "(f, i) -> if(cast(f as double) > __ah_mean, " +
          "shiftleft(cast(1 as bigint), i), cast(0 as bigint))), " +
          "cast(0 as bigint), (a, b) -> a | b)"))
      .drop("__ah_mean")
}
