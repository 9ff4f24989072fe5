package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match record linkage (entity resolution): candidate
  * pairs form ONLY inside a blocking key, then an edit-distance gate
  * keeps near-matches — the public blocking + compare decomposition of
  * record linkage (Fellegi–Sunter framing). Never all-pairs: total
  * compare cost is Σ|block|² over blocks, so the blocking key is THE
  * scale lever; the `maxBlock` rail plus [[oversizedBlocks]] audit make
  * a capped run ship its own evidence (no silent caps).
  *
  * The reference's dedup story is exact keyed upsert only
  * (`Template-to-MySQL/PgSQL-to-MySQL-Method-1.py:76-82` row-wise
  * `ON DUPLICATE KEY UPDATE`); approximate matching is north-star
  * surface (BASELINE.json).
  */
object Linkage {

  /** Near-match pairs (1 ≤ edit distance ≤ maxDist) within blocks of at
    * most `maxBlock` rows. Spark's thresholded `levenshtein(l, r, t)`
    * computes a BANDED distance — O(maxDist·len) per compare instead of
    * O(len²), returning -1 past the bound — so each gate is cheap even
    * on long names; and the gate runs once per DISTINCT (block, name)
    * pair, with id multiplicity re-joined AFTER it — duplicate-heavy
    * corpora (the linkage norm) never repeat a comparison. Distance 0
    * (identical names) is excluded by construction — exact duplicates
    * are [[Dedup]]'s job.
    *
    * Plan: count aggregate (the rail) → semi-join dropping oversized
    * blocks → distinct (block, name) → block-keyed name self-join with
    * the banded gate → two (block, name)-keyed joins fanning matched
    * name pairs back out to id pairs, oriented so `name_a`/`name_b`
    * stay aligned with `id_a < id_b`.
    */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      blockCol: String,
      nameCol: String,
      maxDist: Int,
      maxBlock: Long): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1: $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2: $maxBlock")
    val sizes = df.groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
    val kept = df.join(
      sizes.filter(col("__bn") <= maxBlock).select(col(blockCol)),
      Seq(blockCol), "left_semi")
    val names = kept
      .select(col(blockCol).as("block"), col(nameCol).as("name")).distinct()
    val namePairs = names.select(col("block"), col("name").as("__name_x"))
      .join(names.select(col("block"), col("name").as("__name_y")), Seq("block"))
      .filter(col("__name_x") < col("__name_y"))
      .withColumn("dist", levenshtein(col("__name_x"), col("__name_y"), maxDist))
      .filter(col("dist") >= 1)
    val ids = kept.select(col(blockCol).as("block"),
      col(nameCol).as("name"), col(idCol).as("__id"))
    namePairs
      .join(ids.select(col("block"), col("name").as("__name_x"), col("__id").as("__id_x")),
        Seq("block", "__name_x"))
      .join(ids.select(col("block"), col("name").as("__name_y"), col("__id").as("__id_y")),
        Seq("block", "__name_y"))
      .select(col("block"),
        least(col("__id_x"), col("__id_y")).as("id_a"),
        when(col("__id_x") < col("__id_y"), col("__name_x"))
          .otherwise(col("__name_y")).as("name_a"),
        greatest(col("__id_x"), col("__id_y")).as("id_b"),
        when(col("__id_x") < col("__id_y"), col("__name_y"))
          .otherwise(col("__name_x")).as("name_b"),
        col("dist"))
  }

  /** The audit rail: blocks larger than `maxBlock`, with sizes — run it
    * whenever [[fuzzyPairs]] runs with a cap, so excluded blocks are
    * visible, not silent.
    */
  def oversizedBlocks(df: DataFrame, blockCol: String, maxBlock: Long): DataFrame =
    df.groupBy(col(blockCol).as("block"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > maxBlock)
}
