package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — score every corpus document
  * by how much more likely its hashed n-gram features are under a TARGET
  * distribution (a small trusted/high-quality set) than under the RAW
  * corpus distribution (public method: Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling", NeurIPS; the hashed
  * bag-of-bigrams form is the paper's practical estimator).
  *
  * log w(doc) = Σ_{g ∈ grams(doc)} [ log p̂_T(h(g)) − log p̂_R(h(g)) ]
  * with add-1 smoothing over B hash buckets: p̂(b) = (c_b + 1)/(N + B).
  * Documents that look like the target get positive weights; boilerplate
  * that dominates the raw corpus gets negative ones. Downstream, training
  * data is resampled ∝ exp(log w) (or top-k selected — see
  * [[Sampling.weightedSample]] for the Gumbel/ES machinery).
  *
  * Bucketing hashes each gram with md5 and keys on the first
  * `bucketHexLen` hex chars (B = 16^len buckets) — md5, not xxhash64,
  * so an external SQL engine recomputes identical buckets and the
  * driver's DuckDB oracle can re-derive every weight (same rationale as
  * [[Sampling.shuffleOrder]]).
  *
  * Scale shape: both count tables are B-bounded (≤ 65k rows at len=4) —
  * aggregated distributed, then the per-bucket log-ratio table broadcasts
  * into the scoring scan. The corpus is touched exactly twice (once to
  * count, once to score — the model-build/score split of
  * [[NaiveBayes]]), the target once; the only corpus-keyed shuffle is the
  * final per-doc sum, which carries (id, double). Nothing is ever
  * collected to the driver.
  */
object Dsir {

  private def buckets(df: DataFrame, idCol: String, textCol: String,
      n: Int, hexLen: Int): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.TextFunctions.word_ngrams(col(textCol), n)).as("gram"))
      .select(col(idCol), substring(md5(col("gram")), 1, hexLen).as("bucket"))

  /** Per-document DSIR log importance weight `log_w`, rounded to 4 dp for
    * cross-engine reproducibility. Documents with no n-gram (shorter than
    * `n` tokens) carry no evidence and are absent from the result —
    * callers default them to 0 (= "indistinguishable from raw").
    *
    * `target` is typically a FILTER of the corpus (trusted sources) but
    * can be any external document set sharing `textCol`; buckets the
    * target hits that the corpus never produces simply never surface (no
    * corpus gram maps there).
    */
  def importanceWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      bucketHexLen: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    require(bucketHexLen >= 1 && bucketHexLen <= 8,
      s"bucketHexLen must be in [1,8]: $bucketHexLen")
    val numBuckets = math.pow(16.0, bucketHexLen)
    val raw = buckets(corpus, idCol, textCol, n, bucketHexLen)
    val rawCounts = raw.groupBy("bucket")
      .agg(count(lit(1)).cast("double").as("rc"))
    val tgtCounts = buckets(target, idCol, textCol, n, bucketHexLen)
      .groupBy("bucket")
      .agg(count(lit(1)).cast("double").as("tc"))
    // B-bounded model: per-bucket smoothed log-ratio. Totals are 1-row
    // aggregates cross-joined in (broadcast by size), never collected.
    val rawTot = rawCounts.agg(sum("rc").as("rn"))
    val tgtTot = tgtCounts.agg(coalesce(sum("tc"), lit(0.0)).as("tn"))
    val model = rawCounts
      .join(tgtCounts, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(rawTot))
      .crossJoin(broadcast(tgtTot))
      .select(col("bucket"),
        (log((coalesce(col("tc"), lit(0.0)) + 1.0) / (col("tn") + numBuckets))
          - log((col("rc") + 1.0) / (col("rn") + numBuckets))).as("delta"))
    raw.join(broadcast(model), Seq("bucket"))
      .groupBy(idCol)
      // + 0.0 normalizes IEEE -0.0 (a doc whose grams' target/raw ratios
      // cancel exactly sums to a signed zero under one association order
      // and +0.0 under another — the ×10 gate's hash compare sees two
      // encodings of the same weight)
      .agg((round(sum("delta"), 4) + lit(0.0)).as("log_w"))
  }
}
