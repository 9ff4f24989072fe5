package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining (north-star surface): concatenate
  * every document's tokens in a deterministic order and cut the stream into
  * fixed-size training chunks — the standard concat-and-chunk batching shape
  * (public practice: GPT-2/3-style pretraining packs documents back to back
  * and slices every `chunkTokens`). The result maps each document to the
  * inclusive range of chunk indices it overlaps, from which a loader can
  * build exact (chunk → document spans) manifests.
  *
  * Scale shape: the naive formulation is ONE global running sum —
  * `sum(tokens) over (order by id)` with no partition key, which Spark
  * executes by draining the whole corpus through a single task. Here the
  * running sum is two-level, the classic distributed prefix sum:
  *
  *   1. coarse RANGE BUCKETS of the order key bound each window partition —
  *      per-bucket running sums run fully parallel;
  *   2. per-bucket token totals (ONE row per bucket) roll up in a tiny
  *      unpartitioned window — bounded by the bucket count, not the corpus —
  *      and broadcast-join back as bucket offsets.
  *
  * At 100 TB nothing wider than `corpus / bucketWidth` rows ever passes
  * through an unpartitioned operator, and the corpus itself only shuffles
  * once (into range buckets).
  */
object Packing {

  /** Chunk-range assignment per document.
    *
    * @param df          input with a unique numeric order key `idCol`
    * @param idCol       unique, non-null, non-negative numeric pack order
    * @param tokens      token-count expression (must be >= 1 per row —
    *                    whitespace token counts satisfy this; empty text is
    *                    one empty token)
    * @param chunkTokens fixed training-sequence length in tokens
    * @param bucketWidth id-range width of one prefix-sum bucket; choose so
    *                    corpus/bucketWidth buckets ~ O(10^4) at target scale
    * @return one row per input doc: (idCol, n_tokens, start_tok,
    *         chunk_start, chunk_end) — `start_tok` is the doc's global
    *         token offset, chunk indices inclusive
    */
  def packChunks(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      chunkTokens: Long,
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    val withTok = df.select(
      col(idCol),
      tokens.cast("bigint").as("n_tokens"),
      expr(s"CAST($idCol AS BIGINT) div $bucketWidth").as("__bkt"))
    // level 1: running sum inside each bucket (parallel across buckets)
    val inBucket = Window.partitionBy("__bkt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withTok.withColumn("__before",
      coalesce(sum("n_tokens").over(inBucket), lit(0L)))
    // level 2: bucket offsets — one row per bucket, so the unpartitioned
    // running sum is bounded by the bucket count
    val offsets = withTok.groupBy("__bkt").agg(sum("n_tokens").as("__tot"))
      .withColumn("__off",
        coalesce(sum("__tot").over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bkt", "__off")
    local.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("start_tok", col("__off") + col("__before"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("start_tok"),
        expr(s"start_tok div $chunkTokens").as("chunk_start"),
        expr(s"(start_tok + n_tokens - 1) div $chunkTokens").as("chunk_end"))
  }

  /** Sliding-window document chunking (the RAG/embedding-index shape, and
    * the long-document split step before [[packChunks]]): each document
    * emits windows of at most `maxTokens` space-separated tokens (single
    * `' '` split, empty tokens preserved — the `tokenCount` convention,
    * NOT `\s+` tokenization), starting every `maxTokens - overlapTokens`
    * tokens, so consecutive chunks share `overlapTokens` tokens of context. Every document emits at least one
    * chunk; the final chunk may be short. Pure per-row generator (explode
    * of a bounded sequence) — map-side, no shuffle, fan-out bounded by
    * n_tokens / stride + 1.
    *
    * @return (idCol, chunk_idx, chunk_text, n_chunk_tokens)
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(overlapTokens >= 0 && overlapTokens < maxTokens,
      s"overlapTokens must be in [0, maxTokens): $overlapTokens")
    val stride = maxTokens - overlapTokens
    val toks = split(col(textCol), " ")
    val lastStart = greatest(size(toks) - overlapTokens - 1, lit(0))
    df
      .select(col(idCol), toks.as("__toks"),
        posexplode(sequence(lit(0), lastStart, lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .withColumn("__chunk", slice(col("__toks"), col("__start") + 1, lit(maxTokens)))
      .select(
        col(idCol),
        col("chunk_idx").cast("bigint").as("chunk_idx"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).cast("bigint").as("n_chunk_tokens"))
  }

  /** Conversation / training-sample assembly: collapse an ordered event or
    * turn stream into one text per key — the step that turns raw
    * interaction logs into SFT/chat training documents (and, generally,
    * any group-and-concatenate document build). Turns sort INSIDE the
    * aggregate (`array_sort` over collected (order…, text) structs —
    * struct ordering is field-by-field, so `orderCols` then the text
    * itself break ties deterministically) — input order and partitioning
    * never affect the output.
    *
    * Scale: ONE shuffle keyed by `keyCols` with map-side partial
    * collection; per-key state is the conversation itself, so memory is
    * bounded by the longest conversation — the operator's natural
    * contract (a key with unbounded turns needs a session cut first, e.g.
    * [[graft.etl]] sessionization, exactly as a real chat corpus is cut).
    * All-builtin expressions: collect/sort/transform/join stay codegen'd.
    *
    * @return one row per key: keyCols ++ (n_turns, first/last of
    *         `orderCols.head`, conversation)
    */
  def assembleConversations(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      textCol: String,
      sep: String = "\n"): DataFrame = {
    require(keyCols.nonEmpty, "assembleConversations needs at least one key column")
    require(orderCols.nonEmpty, "assembleConversations needs a deterministic turn order")
    // NULL text renders as "" rather than vanishing: array_join silently
    // DROPS null elements, which would desync `conversation` from `n_turns`
    val turn = struct(
      orderCols.map(col) :+ coalesce(col(textCol), lit("")).as(textCol): _*)
    val ord = orderCols.head
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_turns"),
        min(col(ord)).as(s"first_$ord"),
        max(col(ord)).as(s"last_$ord"),
        array_join(
          transform(array_sort(collect_list(turn)), t => t.getField(textCol)),
          sep).as("conversation"))
  }

  /** Chunk manifest — the inversion a training-data loader consumes: one
    * row per (chunk, doc) overlap with the doc-token span that lands in the
    * chunk (`doc_from` inclusive, `doc_to` exclusive) and the offset inside
    * the chunk where it starts. Each doc explodes over a BOUNDED range
    * (`n_tokens/chunkTokens + 1` chunks), so this adds no shuffle and no
    * skew beyond [[packChunks]]' own.
    */
  def chunkManifest(packed: DataFrame, idCol: String, chunkTokens: Long): DataFrame = {
    val c = lit(chunkTokens)
    packed
      .withColumn("chunk", explode(sequence(col("chunk_start"), col("chunk_end"))))
      .withColumn("__g0", greatest(col("start_tok"), col("chunk") * c))
      .withColumn("__g1", least(col("start_tok") + col("n_tokens"), (col("chunk") + 1) * c))
      .select(
        col("chunk"),
        col(idCol),
        (col("__g0") - col("start_tok")).as("doc_from"),
        (col("__g1") - col("start_tok")).as("doc_to"),
        (col("__g0") - col("chunk") * c).as("chunk_offset"))
  }

  /** Length-bucketed inference batching (the serving-side counterpart of
    * [[packChunks]]): rows rank globally by (length, id) and batch
    * `batchSize` at a time, so each batch holds similar-length documents
    * and pads only to ITS OWN maximum — the standard sorted-batching
    * trick that cuts padding waste from pad-to-global-max to
    * pad-to-batch-max. Output adds `batch` (0-based) and keeps the
    * length for downstream padding accounting.
    *
    * Scale: the global rank is [[Sampling.rankInStratum]]'s bucketed
    * two-level prefix sum — no single-partition sort; batch assignment
    * is map-side arithmetic on the rank.
    */
  def batchByLength(
      df: DataFrame,
      idCol: String,
      lenCol: Column,
      batchSize: Int,
      numBuckets: Int = 0): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    Sampling.rankInStratum(df, lit("__all"), numBuckets, lenCol, col(idCol))
      .withColumn("batch", ((col("stratum_rank") - 1) / batchSize).cast("bigint"))
      .drop("stratum_rank")
  }

  /** KV-cache prefix grouping for inference serving: prompts that share
    * their first `prefixTokens` whitespace tokens are routed to the same
    * group, so a prefix-caching server (public technique: RadixAttention /
    * SGLang, vLLM automatic prefix caching) computes the shared prefix's
    * KV once per group instead of once per prompt. Per group the report
    * carries `n_docs`, the shared `prefix_len` (shorter prompts group by
    * their full text, so the shared length is the group minimum),
    * `total_tokens`, and `saved_tokens = (n_docs − 1) · prefix_len` — the
    * prefill the cache eliminates. Groups rank by savings.
    *
    * Scale: one map-side prefix projection + one groupBy(prefix) — a
    * key-shuffle of (prefix, len) pairs, never the prompt bodies; the
    * report is top-`topK` bounded.
    */
  def prefixGroups(
      df: DataFrame,
      textCol: String,
      prefixTokens: Int,
      topK: Int): DataFrame = {
    require(prefixTokens >= 1, s"prefixTokens must be >= 1: $prefixTokens")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val toks = split(col(textCol), " ")
    df.select(
        array_join(slice(toks, 1, prefixTokens), " ").as("prefix"),
        size(toks).cast("bigint").as("__len"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        least(min(col("__len")), lit(prefixTokens.toLong)).as("prefix_len"),
        sum(col("__len")).as("total_tokens"))
      .withColumn("saved_tokens", (col("n_docs") - 1L) * col("prefix_len"))
      .orderBy(col("saved_tokens").desc, col("prefix"))
      .limit(topK)
  }
}
