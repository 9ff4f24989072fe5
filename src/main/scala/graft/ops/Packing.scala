package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (concat-and-chunk): documents are
  * concatenated in a deterministic order and the resulting token stream is
  * cut into fixed-budget sequences — the standard pretraining pack where a
  * document may span a sequence boundary and no sequence carries padding.
  *
  * The concatenation order is (shard, id): documents are first assigned to
  * `shards` deterministic shards (`id % shards`), then packed in id order
  * WITHIN each shard. Each shard owns its own sequence numbering, so the
  * running-offset window partitions by shard and Spark packs all shards in
  * parallel — the window never sees more than one shard's rows.
  *
  * Scale: a single global concatenation order would force one total-order
  * window (one partition doing all the work). Sharding makes the cumsum
  * embarrassingly parallel: at 100 TB, set `shards` to O(cluster cores) and
  * each window partition packs ~corpus/shards tokens independently; the
  * only shuffle is the hash exchange on shard. Packing quality is
  * unaffected — budget overflow waste is zero by construction (documents
  * split across sequences), and each shard wastes at most `budget-1`
  * trailing tokens.
  */
object Packing {

  /** Per-document pack placement: shard, token count, starting offset in
    * the shard's concatenated token stream, and the first/last sequence
    * (of `budget` tokens) the document lands in.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Int,
      shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(shards > 0, s"shards must be positive: $shards")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), pmod(col(idCol), lit(shards.toLong)).as("shard"),
        tokens.cast("bigint").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("first_seq", expr(s"start_tok div ${budget.toLong}"))
      .withColumn("last_seq",
        expr(s"(start_tok + n_tokens - 1) div ${budget.toLong}"))
  }

  /** Shard-level pack summary: sequences produced and trailing-token waste
    * per shard (total waste across shards is the only padding the pack
    * pays).
    */
  def packSummary(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Int,
      shards: Int): DataFrame =
    packSequences(docs, idCol, tokens, budget, shards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        (max("last_seq") + 1L).as("n_sequences"))
      .withColumn("waste_tokens",
        col("n_sequences") * budget.toLong - col("n_tokens"))
}
