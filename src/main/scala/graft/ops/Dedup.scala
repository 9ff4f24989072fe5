package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (north-star surface, BASELINE.json; beyond the reference's own operators
  * — the reference has no dedup at all, its L3 load even *introduces*
  * duplicates, SURVEY.md §2.6).
  *
  * All operators are pure Column-expression / DataFrame plans: no UDFs, no
  * driver-side loops, deterministic (seeds are fixed literals — no RNG).
  *
  * Scale design:
  * - exact: one hash shuffle on the dedup key — the minimal possible cost.
  * - MinHash+LSH: candidate generation is a self-join on (band, bucket) —
  *   shuffles by bucket id, never materializes the O(n²) pair space. Exact
  *   Jaccard verification runs only on candidates.
  * - SimHash: embarrassingly parallel signature (one pass), then bucket-join
  *   on 16-bit signature bands for near-dup candidates.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `keepBy` per distinct value
    * of `keys`. One shuffle; deterministic winner (vs `dropDuplicates`,
    * which keeps an arbitrary first-seen row).
    */
  def exact(df: DataFrame, keys: Seq[String], keepBy: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toSeq: _*).orderBy(col(keepBy).asc)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Word k-shingles of a text column (space-tokenized). Documents shorter
    * than k tokens yield their whole text as a single shingle.
    */
  def shingles(text: Column, k: Int): Column = {
    val tokens = split(text, " ")
    when(size(tokens) < k, array(array_join(tokens, " ")))
      .otherwise(
        transform(sequence(lit(0), size(tokens) - k),
          i => array_join(slice(tokens, i + 1, lit(k)), " ")))
  }

  /** MinHash signature over a shingle array: `numHashes` independent hash
    * functions realized as `xxhash64(seed_i, shingle)` with fixed integer
    * seeds (deterministic — no RNG), each contributing its minimum.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → minhash signature (`bands*rowsPerBand` hashes) →
    * band buckets (`xxhash64` of each signature band) → self-join on
    * (band, bucket) for candidates → exact Jaccard on distinct shingle sets
    * → filter `>= threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, one row per pair.
    *
    * At 100 TB the only shuffles are by bucket id (candidate generation) and
    * the candidate dedup; the quadratic pair space is never built. Giant
    * buckets from degenerate content are the known skew risk — AQE skew
    * handling applies to the join; a bucket-size cap is the round-2
    * refinement.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = df.select(
        col(idCol).as("id"),
        array_distinct(shingles(col(textCol), shingleK)).as("shingle_set"))
      .withColumn("sig", minhashSignature(col("shingle_set"), numHashes))

    val bandCols = array((0 until bands).map { j =>
      struct(
        lit(j).as("band"),
        xxhash64(lit("band"), lit(j), slice(col("sig"), j * rowsPerBand + 1, rowsPerBand))
          .as("bucket"))
    }: _*)
    val banded = withSig
      .select(col("id"), col("shingle_set"), explode(bandCols).as("bb"))
      .select(col("id"), col("shingle_set"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("shingle_set").as("set_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("shingle_set").as("set_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "set_a", "set_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("__inter", size(array_intersect(col("set_a"), col("set_b"))).cast("double"))
      .withColumn("jaccard",
        col("__inter") / (size(col("set_a")) + size(col("set_b")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact pairwise n-gram Jaccard similarity — the brute-force counterpart
    * of [[minhashLsh]] (its recall oracle in tests). O(n²) pair space: use
    * ONLY on small inputs or pre-blocked groups (`blockBy` restricts pairs
    * to equal values of that column, e.g. language or near-equal length).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.0,
      blockBy: Option[String] = None): DataFrame = {
    val withSets = df.select(
        col(idCol).as("id"),
        blockBy.map(col).getOrElse(lit(0)).as("__blk"),
        array_distinct(shingles(col(textCol), shingleK)).as("shingle_set"))
    val a = withSets.select(col("__blk"), col("id").as("id_a"), col("shingle_set").as("set_a"))
    val b = withSets.select(col("__blk"), col("id").as("id_b"), col("shingle_set").as("set_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__inter", size(array_intersect(col("set_a"), col("set_b"))).cast("double"))
      .withColumn("jaccard",
        col("__inter") / (size(col("set_a")) + size(col("set_b")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash fingerprint of a text column, as a single SQL expression
    * (pure Catalyst HOFs — stays in expression evaluation; no UDF).
    *
    * Token hashes are computed once; each of the 64 bit positions
    * accumulates +1/−1 votes; positive-vote bits set the fingerprint bit.
    */
  def simhash64(textColName: String): Column = expr(
    s"""
    aggregate(
      zip_with(
        aggregate(
          transform(split($textColName, ' '), t -> xxhash64(t)),
          array_repeat(0, 64),
          (acc, h) -> zip_with(acc, sequence(0, 63),
                               (a, i) -> a + if(((h >> i) & 1) = 1, 1, -1))),
        sequence(0, 63),
        (c, i) -> if(c > 0, shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
      cast(0 as bigint),
      (acc, v) -> acc + v)
    """)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: fingerprints are banded into four 16-bit
    * blocks; documents sharing any block are candidates (guaranteed recall
    * for hamming ≤ 3 by pigeonhole), then verified by full hamming distance
    * ≤ `maxHamming`. Returns (id_a, id_b, hamming).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simhash64(textCol).as("fp"))
    val bandCols = array((0 until 4).map { j =>
      struct(
        lit(j).as("band"),
        shiftright(col("fp"), 16 * j).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }: _*)
    val banded = fp.select(col("id"), col("fp"), explode(bandCols).as("bb"))
      .select(col("id"), col("fp"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
