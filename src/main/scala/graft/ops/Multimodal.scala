package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star surface, BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata; decode / feature-extract run per partition in batches.
  *
  * The decode step is a **STUB** — image/audio codecs are not available in
  * this container. [[FakeDecoder]] is a clearly-marked deterministic stand-in
  * (features derived from a byte-content hash); the Spark-side plumbing —
  * schema evolution, partition-batched execution, binary handling — is real
  * and tested, and a real decoder drops in as a `Array[Byte] => Array[Float]`
  * function with zero plan changes.
  *
  * Scale notes: `mapPartitions` keeps per-record decoder state (a real
  * decoder's native context) initialized once per partition, not per row;
  * binary payloads never pass through the driver; feature arrays stay
  * columnar downstream. Skewed payload sizes → repartition upstream by a
  * size-bucket column.
  */
object Multimodal {

  /** STUB decoder: deterministic fake features from a rolling byte hash —
    * stands in for an image/audio feature extractor (no codec libs in this
    * environment). Replace with a real decoder at deployment.
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
      // real decoders init native state HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val feats = if (bytes == null) null else dec(bytes)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize STUB: a real implementation decodes, scales to
    * `width`×`height`, and re-encodes the payload; here the payload passes
    * through (no codecs in this environment) and the metadata struct is
    * updated — the schema/plumbing contract downstream operators rely on.
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
    * (STUB: frame content is a deterministic slice hash; a real
    * implementation samples actual video frames). Output: one row per
    * frame with `frame_idx` and `frame_hash`.
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
}
