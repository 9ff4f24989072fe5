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
  * mean-pools absolute amplitude into time bins. VIDEO payloads in the
  * uncompressed-AVI layout decode for REAL as well: [[AviDibDecoder]]
  * hand-parses the RIFF/AVI container (BI_RGB DIB frames need no codec,
  * the same reasoning as uncompressed PCM) and [[frameSampleVideo]]
  * extracts actual frames; codec-bearing video (H.264 etc. — no JRE
  * codec) routes to the clearly-marked deterministic [[FakeDecoder]]
  * stand-in. [[decodeFeaturesAuto]] dispatches per row on the format
  * column — the mixed-modality corpus shape. The Spark-side plumbing —
  * schema evolution, partition-batched execution, binary handling — is
  * shared by all branches, and an external codec drops in as another
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

  /** Video container formats [[AviDibDecoder]] parses by hand
    * (uncompressed BI_RGB DIB frames in a RIFF AVI — no codec needed,
    * same reasoning as uncompressed PCM).
    */
  val VideoFormats: Set[String] = Set("avi")

  /** STUB decoder for payload types with NO codec in the JRE and no
    * hand-parseable uncompressed layout (codec-bearing video/audio —
    * H.264, MP3, …): deterministic fake features from a rolling byte
    * hash. Image payloads decode via [[ImageIODecoder]], WAV audio via
    * [[WavPcmDecoder]], uncompressed-AVI video via [[AviDibDecoder]] (or
    * the [[decodeFeaturesAuto]] dispatch). Replace with an external
    * codec binding at deployment.
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

  /** `MJPG` fourcc as the little-endian u32 a BITMAPINFOHEADER carries. */
  private val MjpgFourcc: Int = 0x47504A4D // 'M','J','P','G' little-endian

  /** Parsed AVI layout: frame geometry, the video codec (`"dib"` for
    * uncompressed BI_RGB, `"mjpg"` for Motion-JPEG), and each frame
    * chunk's byte offset + size inside the payload (DIB frames are all
    * `stride·height` bytes; MJPEG frames are variable-size baseline
    * JPEGs).
    */
  private[ops] final case class AviLayout(
      width: Int, height: Int, codec: String,
      frameOffsets: IndexedSeq[Int], frameSizes: IndexedSeq[Int]) {
    /** bottom-up DIB rows, 4-byte-aligned stride */
    val stride: Int = ((width * 3 + 3) / 4) * 4
  }

  /** Hand-parsed RIFF/AVI walk (the [[WavPcmDecoder]] chunk-walk applied
    * to the AVI container): locates the VIDEO stream's `strf`
    * BITMAPINFOHEADER inside the `hdrl` LIST — keyed on the enclosing
    * `strl`'s `strh` having fccType `vids`, so a file whose audio stream
    * precedes the video stream parses correctly (an `auds` strl's strf is
    * a ~16-byte WAVEFORMATEX, not a bitmap header) — and collects every
    * `##db`/`##dc` frame chunk inside the `movi` LIST. Accepts 24-bit
    * BI_RGB (uncompressed DIB — no codec needed) and `MJPG` (each frame a
    * baseline JPEG the JRE's ImageIO decodes). DIB frame chunks are
    * validated against `stride·height` so a short chunk fails loudly here
    * instead of reading past its end downstream. Pure byte arithmetic,
    * deterministic everywhere. Throws on non-AVI payloads, other codecs,
    * or truncated chunks.
    */
  private[ops] def parseAvi(bytes: Array[Byte]): AviLayout = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Int =
      ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24))
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(bytes.length >= 24 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "payload is not a RIFF/AVI file")
    var width = -1
    var height = -1
    var codec: String = null
    var lastStrh = "" // fccType of the most recent strh — keys strf parsing
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "db" || id.substring(2) == "dc")
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = tag(pos)
        val size = u32(pos + 4)
        require(size >= 0 && pos + 8 + size <= to, s"truncated AVI chunk '$id'")
        if (id == "LIST") {
          val listType = tag(pos + 8)
          if (listType == "strl") lastStrh = "" // each stream declares its own strh
          walk(pos + 12, pos + 8 + size, inMovi || listType == "movi")
        } else if (id == "strh") {
          require(size >= 4, "malformed strh chunk")
          lastStrh = tag(pos + 8)
        } else if (id == "strf" && lastStrh == "vids" && codec == null) {
          // BITMAPINFOHEADER: biSize, width, height, planes, bitCount, compression
          require(size >= 40, "malformed video strf chunk")
          width = u32(pos + 8 + 4)
          height = u32(pos + 8 + 8)
          val bitCount = u16(pos + 8 + 14)
          val compression = u32(pos + 8 + 16)
          if (compression == 0) {
            require(bitCount == 24,
              s"only 24-bit BI_RGB DIB frames supported (bits=$bitCount)")
            codec = "dib"
          } else if (compression == MjpgFourcc) {
            codec = "mjpg"
          } else {
            require(requirement = false,
              s"unsupported video codec fourcc $compression (want BI_RGB or MJPG)")
          }
        } else if (inMovi && isFrameChunk(id)) {
          offs += pos + 8
          sizes += size
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length, inMovi = false)
    require(width > 0 && height > 0 && codec != null, "AVI has no video strf header")
    require(offs.nonEmpty, "AVI has no frame chunks in movi")
    val layout = AviLayout(width, height, codec, offs.toIndexedSeq, sizes.toIndexedSeq)
    if (codec == "dib") {
      val expect = layout.stride * height
      sizes.foreach(sz => require(sz == expect,
        s"DIB frame chunk is $sz bytes, want stride*height = $expect"))
    }
    layout
  }

  /** Mean luminance of frame `f`, codec-dispatched: DIB frames read the
    * bottom-up BGR rows directly (4-byte-aligned stride); MJPEG frames
    * decode the frame's JPEG bytes through the JRE's ImageIO and average
    * `getRGB` pixels. Both use luminance = (r + g + b)/(3·255), matching
    * [[ImageIODecoder]]'s definition.
    */
  private[ops] def aviFrameMeanLuma(bytes: Array[Byte], layout: AviLayout, f: Int): Double = {
    val off = layout.frameOffsets(f)
    if (layout.codec == "mjpg") {
      val img = ImageIO.read(new ByteArrayInputStream(bytes, off, layout.frameSizes(f)))
      require(img != null, "MJPG frame is not a JRE-decodable JPEG")
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
          x += 1
        }
        y += 1
      }
      sum / (img.getWidth * img.getHeight)
    } else {
      var sum = 0.0
      var y = 0
      while (y < layout.height) {
        val rowOff = off + (layout.height - 1 - y) * layout.stride
        var x = 0
        while (x < layout.width) {
          val p = rowOff + x * 3
          sum += ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)) /
            (3.0 * 255.0)
          x += 1
        }
        y += 1
      }
      sum / (layout.width * layout.height)
    }
  }

  /** REAL video decoder — hand-parsed AVI ([[parseAvi]]), covering both
    * uncompressed BI_RGB DIB frames (pure byte arithmetic) and
    * Motion-JPEG frames (each frame a baseline JPEG through the JRE's
    * ImageIO — zero new codec code): each frame's mean luminance,
    * mean-pooled into `dim` evenly-spaced time bins — the temporal
    * analogue of [[WavPcmDecoder]]'s amplitude bins, features in [0, 1].
    * Bins past the last frame (clip shorter than `dim` frames) are 0.
    * Deterministic.
    */
  def AviDibDecoder(dim: Int)(bytes: Array[Byte]): Array[Float] = {
    val layout = parseAvi(bytes)
    val n = layout.frameOffsets.length
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var f = 0
    while (f < n) {
      val bin = f * dim / n
      sums(bin) += aviFrameMeanLuma(bytes, layout, f)
      counts(bin) += 1
      f += 1
    }
    Array.tabulate(dim) { i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat
    }
  }

  /** Deterministic synthetic AVI (fixture generator for the video leg):
    * a genuine RIFF/AVI with `nFrames` uncompressed 24-bit BI_RGB DIB
    * frames whose pixels are a SplitMix-style mix of (seed, frame, x, y)
    * biased so mean luminance RAMPS with the frame index (each frame
    * distinguishable — pooled features are monotone, not flat noise).
    * Parse + decode is bit-exact everywhere, so features and frame
    * hashes derived from these clips are pinnable oracle values, exactly
    * like [[syntheticPng]] / [[syntheticWav]].
    */
  def syntheticAvi(seed: Long, w: Int = 8, h: Int = 8, nFrames: Int = 12): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val hdrlSize = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    // hdrl LIST: avih + one strl (strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(100000).putInt(frameBytes * 10).putInt(0).putInt(0)
    buf.putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
    buf.putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putInt(0).putInt(0)
    buf.putInt(1).putInt(10) // scale/rate = 10 fps
    buf.putInt(0).putInt(nFrames).putInt(frameBytes).putInt(-1).putInt(0)
    buf.putShort(0.toShort).putShort(0.toShort)
      .putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
    buf.putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    // movi LIST: one 00db DIB chunk per frame, rows bottom-up BGR
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nFrames) {
      fourcc("00db"); buf.putInt(frameBytes)
      // luminance floor ramps with f: frame means are strictly increasing
      val floorByte = (f * 192) / math.max(nFrames - 1, 1)
      var row = 0
      while (row < h) {
        val y = h - 1 - row // DIB rows are bottom-up
        var x = 0
        while (x < w) {
          var z = seed ^ (f * 0x9e3779b97f4a7c15L) ^
            (x * 0xc2b2ae3d27d4eb4fL) ^ (y * 0x165667b19e3779f9L)
          z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
          z ^= z >>> 29
          // noise spans [floor, floor+63]: per-frame mean ≈ floor + 31.5
          buf.put((floorByte + ((z >>> 0) & 0x3f)).toByte)
          buf.put((floorByte + ((z >>> 8) & 0x3f)).toByte)
          buf.put((floorByte + ((z >>> 16) & 0x3f)).toByte)
          x += 1
        }
        var pad = w * 3
        while (pad < stride) { buf.put(0.toByte); pad += 1 }
        row += 1
      }
      f += 1
    }
    buf.array()
  }

  /** Distribute the SLIM id rows across all cores before generating the
    * heavy payloads: the generators are CPU-bound per row and otherwise
    * inherit the id scan's split count — a single-row-group parquet
    * source plans ONE producing task however many cores exist,
    * serializing synthesis and every downstream decode (guide §2.5
    * input-skew remedy: repartition immediately after an unsplittable
    * read; §8: shuffle the bare keys, let the payload bytes be born
    * distributed). The exchange carries only the pre-payload columns —
    * a few bytes per row at any corpus size.
    */
  private def spreadForGeneration(df: DataFrame): DataFrame = {
    // never REDUCE parallelism: an id frame that already has more splits
    // than cores (multi-row-group source at scale) keeps them; only the
    // under-split case is lifted to core count. The id frames feeding the
    // synthesizers are scan+filter/union shapes, so getNumPartitions is
    // plan-time only (no exchange to pre-execute).
    val cores = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(math.max(df.rdd.getNumPartitions, cores))
  }

  /** Deterministic AVI payload synthesis over an id frame — the fixture
    * shape for the real video leg ([[syntheticAvi]] seeded by the id,
    * executor-side generation; payloads never cross the driver).
    */
  def synthesizeAviPayloads(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("format", StringType))
    val idIdx = df.schema.fieldIndex(idCol)
    spreadForGeneration(df).mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ syntheticAvi(r.getLong(idIdx)) :+ "avi")
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic synthetic Motion-JPEG AVI (fixture generator for the
    * MJPEG video leg): a genuine RIFF/AVI whose `nFrames` `00dc` chunks
    * are baseline JPEGs (ImageIO-encoded) of a smooth seed-derived cosine
    * luminance field whose base level RAMPS with the frame index — frame
    * means stay monotone even after the lossy JPEG round-trip. The AUDIO
    * `strl` deliberately precedes the video `strl` (a layout real muxers
    * produce) — the regression shape for [[parseAvi]] keying the video
    * header on `strh` fccType rather than file order. Encode + decode
    * both run through the same JRE, so derived features are pinnable
    * oracle values like [[syntheticAvi]]'s.
    */
  def syntheticMjpgAvi(seed: Long, w: Int = 16, h: Int = 16, nFrames: Int = 12): Array[Byte] = {
    val jpegs: IndexedSeq[Array[Byte]] = (0 until nFrames).map { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val base = 32 + (f * 160) / math.max(nFrames - 1, 1)
      def phase(i: Long): Double = ((mix64(seed + i) & 0x7fffffffL) % 6283) / 1000.0
      val px = phase(f.toLong * 2)
      val py = phase(f.toLong * 2 + 1)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = math.cos(2 * math.Pi * x / w + px) * math.cos(2 * math.Pi * y / h + py)
          val lum = math.max(0, math.min(255, base + (24 * v).toInt))
          img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val strlAudSize = 4 + (8 + 56) + (8 + 16) // strh + WAVEFORMATEX strf
    val strlVidSize = 4 + (8 + 56) + (8 + 40) // strh + BITMAPINFOHEADER strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlAudSize) + (8 + strlVidSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(100000).putInt(0).putInt(0).putInt(0)
    buf.putInt(nFrames).putInt(0).putInt(2).putInt(0)
    buf.putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    // audio strl FIRST — its ~16-byte strf must NOT be taken for the
    // bitmap header (the parseAvi strh-keying regression shape)
    fourcc("LIST"); buf.putInt(strlAudSize); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("auds"); buf.putInt(0)
    buf.putInt(0).putInt(0).putInt(0)
    buf.putInt(1).putInt(8000) // scale/rate = 8 kHz
    buf.putInt(0).putInt(0).putInt(0).putInt(-1).putInt(2)
    buf.putShort(0.toShort).putShort(0.toShort)
      .putShort(0.toShort).putShort(0.toShort)
    fourcc("strf"); buf.putInt(16)
    buf.putShort(1.toShort).putShort(1.toShort) // PCM, mono
      .putInt(8000).putInt(16000)
      .putShort(2.toShort).putShort(16.toShort)
    // video strl: strh 'vids'/'MJPG' + strf with biCompression = MJPG
    fourcc("LIST"); buf.putInt(strlVidSize); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    buf.putInt(0).putInt(0).putInt(0)
    buf.putInt(1).putInt(10) // scale/rate = 10 fps
    buf.putInt(0).putInt(nFrames).putInt(0).putInt(-1).putInt(0)
    buf.putShort(0.toShort).putShort(0.toShort)
      .putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
    buf.putInt(MjpgFourcc).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    jpegs.foreach { j =>
      fourcc("00dc"); buf.putInt(j.length); buf.put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte) // word alignment
    }
    buf.array()
  }

  /** Deterministic Motion-JPEG AVI payload synthesis over an id frame —
    * the fixture shape for the MJPEG video leg ([[syntheticMjpgAvi]]
    * seeded by the id, executor-side generation; payloads never cross the
    * driver).
    */
  def synthesizeMjpgPayloads(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("format", StringType))
    val idIdx = df.schema.fieldIndex(idCol)
    spreadForGeneration(df).mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ syntheticMjpgAvi(r.getLong(idIdx)) :+ "avi")
      }
    }(Encoders.row(outSchema))
  }

  /** REAL video frame sampling over uncompressed-AVI payloads: parse the
    * container, pick `n` evenly-spaced ACTUAL frames, and emit each one's
    * decoded mean luminance plus a rolling hash of its pixel bytes — one
    * row per (payload, sampled frame). Partition-batched like the
    * decoders; payloads never cross the driver. (The byte-hash
    * [[frameSample]] remains for codec-less formats.)
    */
  def frameSampleVideo(df: DataFrame, binCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val outSchema = StructType(df.select(idCol).schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_no", IntegerType),
      StructField("mean_luma", DoubleType),
      StructField("frame_hash", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.flatMap { r =>
      val id = r.get(idIdx)
      val bytes = r.getAs[Array[Byte]](binIdx)
      if (bytes == null) Iterator.empty
      else {
        val layout = parseAvi(bytes)
        val total = layout.frameOffsets.length
        (0 until math.min(n, total)).iterator.map { i =>
          val frameNo = i * total / math.min(n, total)
          val off = layout.frameOffsets(frameNo)
          val frameLen = layout.frameSizes(frameNo) // = stride·height for DIB
          val luma = math.round(
            aviFrameMeanLuma(bytes, layout, frameNo) * 10000).toDouble / 10000
          var hsh = 1125899906842597L
          var p = off
          while (p < off + frameLen) { hsh = 31 * hsh + (bytes(p) & 0xff); p += 1 }
          Row(id, i, frameNo, luma, hsh)
        }
      }
    }(Encoders.row(outSchema))
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
    * [[WavPcmDecoder]], uncompressed-AVI rows decode for real via
    * [[AviDibDecoder]]; anything else (a codec-bearing format the JVM
    * can't decode) takes the [[FakeDecoder]] stand-in. One
    * partition-batched pass, decoders initialized once per partition;
    * `dim` must be a perfect square (the image grid is `√dim`×`√dim`;
    * audio and video use `dim` time bins).
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
      val video = AviDibDecoder(dim) _
      val stub = FakeDecoder(dim) _
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val fmt = if (r.isNullAt(fmtIdx)) "" else r.getString(fmtIdx).toLowerCase
        val feats =
          if (bytes == null) null
          else if (ImageFormats.contains(fmt)) image(bytes)
          else if (AudioFormats.contains(fmt)) audio(bytes)
          else if (VideoFormats.contains(fmt)) video(bytes)
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
    spreadForGeneration(df).mapPartitions { rows =>
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
    spreadForGeneration(df).mapPartitions { rows =>
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
