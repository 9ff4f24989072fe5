package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-preserving release transforms for training corpora: k-anonymity
  * suppression, rare-value generalization, and the l-diversity audit —
  * the table-shape complement of the per-string PII scrubbing in
  * [[TextAnalysis.scrub]] (public practice: Sweeney's k-anonymity /
  * Machanavajjhala's l-diversity; a corpus released with (lang, source,
  * length-bucket, …) metadata re-identifies authors of rare combinations
  * even when the text itself is scrubbed).
  *
  * Scale shape: every operator is ONE pass over the corpus with ONE
  * shuffle keyed by the quasi-identifier tuple. Group cardinality is
  * data-dependent (worst case ~rows), so group-count tables are never
  * collected or broadcast — the count reaches each row either through a
  * count window over the same key (suppression: rows shuffle once, no
  * second corpus scan) or stays inside a hash aggregate (audits). A
  * mega-group (one quasi tuple covering a large corpus fraction) costs a
  * per-partition sort of that group's rows, not memory — count windows
  * spill; there is no per-group state beyond the running count.
  */
object Anonymize {

  /** k-anonymous subset: rows whose quasi-identifier group has at least
    * `k` members survive; rows in smaller groups are SUPPRESSED (dropped),
    * so every released row is indistinguishable from ≥ k-1 others on the
    * quasi columns. NULL quasi values group together (SQL GROUP BY
    * semantics — a NULL-lang group of size ≥ k is legitimately
    * k-anonymous).
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(quasiCols.nonEmpty, "kAnonymize needs at least one quasi-identifier column")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("__gn", count(lit(1)).over(w))
      .filter(col("__gn") >= k)
      .drop("__gn")
  }

  /** Rare-value generalization: values of `colName` whose GLOBAL frequency
    * is below `k` are replaced by `fallback` (the "other" bucket),
    * preserving the row (vs [[kAnonymize]]'s suppression) at the cost of
    * coarser metadata. NULLs pass through unchanged — they are already a
    * non-identifying bucket. Same one-shuffle count-window shape.
    */
  def generalizeRare(df: DataFrame, colName: String, k: Int,
      fallback: String = "other"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(col(colName))
    df.withColumn("__vn", count(col(colName)).over(w))
      .withColumn(colName,
        when(col(colName).isNotNull && col("__vn") < k, lit(fallback))
          .otherwise(col(colName)))
      .drop("__vn")
  }

  /** l-diversity audit over a [[kAnonymize]]-released table: per
    * quasi-identifier group, the group size and the number of DISTINCT
    * sensitive values — a k-anonymous group where every member shares one
    * sensitive value still leaks it (homogeneity attack); groups with
    * `n_sensitive` below the caller's l threshold need suppression or
    * wider generalization. One hash aggregate keyed by the quasi tuple.
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit needs at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
  }

  /** ε-differentially-private group counts via the Laplace mechanism
    * (Dwork et al., TCC 2006): each group's true count is released with
    * additive Laplace(Δ/ε) noise, Δ = 1 for counting queries where one
    * individual contributes one row. Noise is DETERMINISTIC per
    * (seed, group) — a uniform u ∈ (0,1) from the 32-bit md5 prefix of
    * `seed:group` (the repo's engine-recomputable randomness idiom,
    * [[Sampling.mixEpochs]]) through the Laplace inverse CDF
    * `-b·sign(u−½)·ln(1−2|u−½|)` — so a release is reproducible and
    * auditable, and the oracle replays it in plain SQL. (A production
    * release would also keep the seed secret; determinism here is the
    * point — same seed = same release, no fresh privacy spend.)
    *
    * `err95` carries the mechanism's 95th-percentile absolute error
    * `b·ln(20)` (Laplace tail: P(|X|>t) = e^(−t/b)) so consumers see the
    * noise floor next to every released count. Scale: one map-side
    * partial count aggregate; noise is a per-GROUP scalar expression —
    * nothing beyond the group frame is touched.
    */
  def dpCounts(
      df: DataFrame,
      groupCol: String,
      epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    val b = 1.0 / epsilon
    val u = (conv(substring(md5(
        concat_ws(":", lit(seed), col(groupCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") + 0.5d) / 4294967296.0d
    val centered = u - 0.5d
    val noise = (signum(centered) * log(lit(1.0d) - abs(centered) * 2.0d)) * -b
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + noise, 4).as("n_noisy"),
        lit(epsilon).as("epsilon"),
        round(lit(b * math.log(20.0)), 4).as("err95"))
  }
}
