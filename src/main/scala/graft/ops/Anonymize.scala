package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic per-(seed, group) Laplace(b) noise — the repo's
    * engine-recomputable randomness idiom ([[Sampling.mixEpochs]]): a
    * uniform u ∈ (0,1) from the 32-bit md5 prefix of `seed:group`
    * through the Laplace inverse CDF `-b·sign(u−½)·ln(1−2|u−½|)`.
    */
  private def laplaceNoise(group: Column, seed: String, b: Double): Column = {
    val u = (conv(substring(md5(
        concat_ws(":", lit(seed), group.cast("string"))), 1, 8), 16, 10)
      .cast("double") + 0.5d) / 4294967296.0d
    val centered = u - 0.5d
    (signum(centered) * log(lit(1.0d) - abs(centered) * 2.0d)) * -b
  }

  /** A DP release in a [[dpLedger]] schedule: `id` names the release,
    * `epsilon` is its budget, `seed` keys its (deterministic) noise.
    */
  final case class DpRelease(id: String, epsilon: Double, seed: String)

  /** ============ DETERMINISTIC DP *SIMULATION* — NOT A PRIVATE RELEASE
    * ============ The Laplace noise here is a deterministic public
    * function of (seed, group): anyone who knows the seed (a plain API
    * argument, replayed verbatim in the DuckDB oracles) can subtract the
    * noise exactly and recover the true counts. That determinism is the
    * POINT in this engine — same seed = same release = benchable,
    * oracle-checkable, no fresh noise per re-run — but it means these
    * operators demonstrate the Laplace-mechanism ALGEBRA (noise scale,
    * error bounds, composition accounting), they do not deliver privacy.
    * A production release draws the noise from a secret entropy source;
    * everything else (clamping, sensitivity, ε accounting) is identical.
    *
    * Group counts via the Laplace mechanism (Dwork et al., TCC 2006):
    * each group's true count is released with additive Laplace(Δ/ε)
    * noise, Δ = 1 for counting queries where one individual contributes
    * one row. `err95` carries the mechanism's 95th-percentile absolute
    * error `b·ln(20)` (Laplace tail: P(|X|>t) = e^(−t/b)) so consumers
    * see the noise floor next to every released count. Scale: one
    * map-side partial count aggregate; noise is a per-GROUP scalar
    * expression — nothing beyond the group frame is touched.
    */
  def dpCounts(
      df: DataFrame,
      groupCol: String,
      epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    val b = 1.0 / epsilon
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + laplaceNoise(col(groupCol), seed, b), 4).as("n_noisy"),
        lit(epsilon).as("epsilon"),
        round(lit(b * math.log(20.0)), 4).as("err95"))
  }

  /** Clamped ε-DP group sums (same deterministic-simulation caveat as
    * [[dpCounts]]): each value is clamped into [lo, hi] BEFORE summing —
    * the bounded-contribution step that caps the sum's sensitivity at
    * `max(|lo|, |hi|)` (one row added or removed moves the clamped sum by
    * at most that), per Dwork & Roth 2014 §3.3 — then Laplace(Δ/ε) noise
    * is added per group. Without the clamp a single wild row would make
    * the sensitivity — and the required noise — unbounded.
    */
  def dpSum(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Double,
      hi: Double,
      epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    require(lo < hi, s"need lo < hi: $lo, $hi")
    val sens = math.max(math.abs(lo), math.abs(hi))
    val b = sens / epsilon
    val clamped = greatest(lit(lo), least(lit(hi), col(valueCol)))
    df.groupBy(col(groupCol))
      .agg(sum(clamped).as("__s"))
      .select(col(groupCol),
        round(col("__s") + laplaceNoise(col(groupCol), seed, b), 4).as("sum_noisy"),
        lit(epsilon).as("epsilon"),
        round(lit(b * math.log(20.0)), 4).as("err95"))
  }

  /** Clamped ε-DP group means (same deterministic-simulation caveat as
    * [[dpCounts]]) via the standard two-query decomposition: a clamped
    * noisy SUM and a noisy COUNT, each on ε/2, whose ratio is the
    * released mean — sequential composition makes the total spend exactly
    * ε (Dwork & Roth 2014 §3.5). The count leg is floored at 1 before
    * dividing so an unlucky small group cannot divide by ≤ 0. Output:
    * (group, mean_noisy, n_noisy, epsilon).
    */
  def dpMean(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Double,
      hi: Double,
      epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    require(lo < hi, s"need lo < hi: $lo, $hi")
    val sens = math.max(math.abs(lo), math.abs(hi))
    val bS = sens / (epsilon / 2)
    val bC = 1.0 / (epsilon / 2)
    val clamped = greatest(lit(lo), least(lit(hi), col(valueCol)))
    df.groupBy(col(groupCol))
      .agg(sum(clamped).as("__s"), count(lit(1)).as("__n"))
      .select(col(groupCol),
        (col("__s") + laplaceNoise(col(groupCol), s"$seed:sum", bS)).as("__sn"),
        (col("__n") + laplaceNoise(col(groupCol), s"$seed:cnt", bC)).as("__nn"))
      .select(col(groupCol),
        round(col("__sn") / greatest(col("__nn"), lit(1.0d)), 4).as("mean_noisy"),
        round(col("__nn"), 4).as("n_noisy"),
        lit(epsilon).as("epsilon"))
  }

  /** Per-release DP ledger (same deterministic-simulation caveat as
    * [[dpCounts]]): a training-data pipeline re-releases its group counts
    * on a cadence, and under SEQUENTIAL COMPOSITION (Dwork & Roth 2014
    * Thm 3.14) the privacy spend against the same data ADDS — the ledger
    * is the accounting a release process must keep. Each scheduled
    * [[DpRelease]] contributes its [[dpCounts]] rows tagged with the
    * release id plus `eps_cumulative`, the running Σε up to and including
    * that release (computed release-order, a driver-side literal — the
    * schedule is caller-bounded, never data-sized).
    */
  def dpLedger(
      df: DataFrame,
      groupCol: String,
      releases: Seq[DpRelease]): DataFrame = {
    require(releases.nonEmpty, "dpLedger needs at least one release")
    require(releases.map(_.id).distinct.size == releases.size,
      s"release ids must be unique: ${releases.map(_.id)}")
    val cumulative = releases.scanLeft(0.0)(_ + _.epsilon).tail
    releases.zip(cumulative).map { case (r, cum) =>
      dpCounts(df, groupCol, r.epsilon, r.seed)
        .select(lit(r.id).as("release_id"), col(groupCol), col("n_noisy"),
          col("epsilon"), col("err95"),
          round(lit(cum), 4).as("eps_cumulative"))
    }.reduce(_ unionByName _)
  }
}
