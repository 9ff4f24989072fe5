package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-value sketch with SET-OPERATION
  * support (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream"; Beyer et al. 2007 on multiset-operation synopses — the
  * simplest member of the theta-sketch family; public method).
  *
  * HLL++ ([[graft.SparkEntry]]'s `corpus_sketch_profile`) estimates ONE
  * set's cardinality but cannot intersect; KMV can. The k smallest hash
  * values of a set are a uniform sample of its hashed distinct values:
  *
  *   n̂(A)      = (k − 1) / F(h_(k))   — F = the kth minimum, normalized
  *                                      to [0, 1); exact when |A| < k
  *   ρ̂(A, B)   = |K(A ∪ B) ∩ A ∩ B| / |K(A ∪ B)|   — Jaccard
  *   |A ∩ B|̂  = ρ̂ · n̂(A ∪ B)
  *
  * Membership of a union-sketch minimum in a side's sketch is EXACT
  * (x ≤ kth-min(A ∪ B) ≤ kth-min(A) for any x hashed from A), so the
  * Jaccard numerator needs no extra state. Deterministic end to end:
  * values hash with xxhash64 (fixed seed), no RNG — sketches and
  * estimates are pinnable oracle values.
  *
  * Scale shape: the sketch is a bounded, associative/commutative
  * aggregation buffer (≤ k longs), so Spark runs it PARTIALLY per
  * partition — only ≤ k values per (group, partition) cross the shuffle,
  * the [[Similarity.TopKAggregator]] property. Overlap estimation then
  * operates on the GROUP-level sketch table (one ≤k-array row per
  * group), never the raw data.
  */
object Kmv {

  /** Hashes are stored SHIFTED (`h ^ Long.MinValue`) so their SIGNED
    * order equals the raw hash's unsigned order — plain sorts and
    * comparisons work everywhere (Spark array functions, the oracle).
    */
  private val TwoPow63 = 9.2233720368547758e18 // 2^63
  private val TwoPow64 = 1.8446744073709552e19 // 2^64

  /** Bounded sorted-distinct-minima buffer: keeps the k smallest shifted
    * hashes. Associative/commutative merge ⇒ partial aggregation.
    */
  class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2, s"k must be >= 2: $k")
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
      if (buf.size >= k && v >= buf.last) buf
      else if (buf.contains(v)) buf
      else {
        val (pre, post) = buf.span(_ < v)
        ((pre :+ v) ++ post).take(k)
      }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(reduce)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group KMV sketch of `valueCol`: one row per group with the
    * sorted `kmv` array (≤ k shifted hashes). NULL values are skipped
    * (they carry no distinct identity).
    */
  def sketch(df: DataFrame, groupCol: Column, valueCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(valueCol.isNotNull)
      .select(groupCol.cast("string").as("grp"),
        xxhash64(valueCol).bitwiseXOR(lit(Long.MinValue)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new KmvAggregator(k).toColumn.name("kmv"))
      .toDF("grp", "kmv")
  }

  /** Distinct-count estimate from a `kmv` array column: exact size when
    * the sketch is unsaturated (the group had < k distinct values —
    * the sketch IS its hash set), else (k−1)/F(kth minimum).
    */
  def estimateDistinct(kmv: Column, k: Int): Column = {
    val kth = element_at(kmv, k)
    val f = (kth.cast("double") + lit(TwoPow63)) / lit(TwoPow64)
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) / greatest(f, lit(1e-18)))
  }

  /** Multi-way union: merge EVERY group's sketch into one union sketch
    * inside a single aggregate — one row, `kmv` = the k smallest hashes
    * across all groups. The aggregation state is bounded (the input is
    * the group-level sketch table, ≤ #groups·k hashes total, and the
    * union sketch itself is ≤ k), and `collect_set` partials merge
    * associatively, so this runs map-side-combined like [[sketch]].
    * Estimating |A₁ ∪ … ∪ Aₘ| from the result costs one
    * [[estimateDistinct]] — no pairwise inclusion-exclusion cascade.
    */
  def unionAll(sketches: DataFrame, k: Int): DataFrame =
    sketches
      .select(explode(col("kmv")).as("__h"))
      .agg(slice(array_sort(collect_set(col("__h"))), 1, k).as("kmv"))

  /** All-pairs set-overlap estimates between the groups of a [[sketch]]
    * table: (grp_a, grp_b, jaccard_est, n_union_est, n_common_est).
    * Pure array arithmetic over the group-level sketch rows — the
    * (#groups)² pair frame never touches the raw data. Estimates round
    * to 4 dp (the repo-wide determinism convention).
    */
  def overlap(sketches: DataFrame, k: Int): DataFrame = {
    val a = sketches.select(col("grp").as("grp_a"), col("kmv").as("kmv_a"))
    val b = sketches.select(col("grp").as("grp_b"), col("kmv").as("kmv_b"))
    val unionK = slice(array_sort(array_distinct(concat(col("kmv_a"), col("kmv_b")))), 1, k)
    val m = size(array_intersect(array_intersect(col("__uk"), col("kmv_a")), col("kmv_b")))
    a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("__uk", unionK)
      .withColumn("__j", m.cast("double") / size(col("__uk")))
      .withColumn("__nu", estimateDistinct(col("__uk"), k))
      .select(col("grp_a"), col("grp_b"),
        round(col("__j"), 4).as("jaccard_est"),
        round(col("__nu"), 4).as("n_union_est"),
        round(col("__j") * col("__nu"), 4).as("n_common_est"))
  }

  /** [[overlap]] completed into the full audience algebra a
    * mixture-planning user needs per pair: per-side cardinalities and the
    * DIFFERENCE estimates |A∖B|̂ = max(n̂(A) − |A∩B|̂, 0) /
    * |B∖A|̂ = max(n̂(B) − |A∩B|̂, 0) — the set operation HLL-family
    * sketches cannot answer (no intersection ⇒ no difference). Same
    * scale shape as [[overlap]]: pure array arithmetic over the
    * group-level sketch table, never the raw data.
    */
  def overlapMatrix(sketches: DataFrame, k: Int): DataFrame =
    overlap(sketches, k)
      .join(sketches.select(col("grp").as("grp_a"), col("kmv").as("__ka")), Seq("grp_a"))
      .join(sketches.select(col("grp").as("grp_b"), col("kmv").as("__kb")), Seq("grp_b"))
      .withColumn("__na", estimateDistinct(col("__ka"), k))
      .withColumn("__nb", estimateDistinct(col("__kb"), k))
      .select(col("grp_a"), col("grp_b"), col("jaccard_est"),
        col("n_union_est"), col("n_common_est"),
        round(col("__na"), 4).as("n_a_est"),
        round(col("__nb"), 4).as("n_b_est"),
        round(greatest(col("__na") - col("n_common_est"), lit(0.0)), 4).as("n_diff_ab_est"),
        round(greatest(col("__nb") - col("n_common_est"), lit(0.0)), 4).as("n_diff_ba_est"))

  /** Trailing-window distinct timeline: per bucket of a [[sketch]] table
    * (grp = the bucket label, sorted ascending — ISO dates sort
    * chronologically), the bucket's own distinct estimate AND the
    * distinct estimate of the last `windowLen` buckets' UNION, by KMV
    * merge. This is the sketch-algebra answer to "7-day active users,
    * daily": an exact COUNT(DISTINCT) per trailing window re-reads
    * `windowLen` days of raw data per day — O(span · window) scans at
    * 100 TB — while the sketches merge in bucket-space (array concat +
    * sort + slice k, codegen'd).
    *
    * Scale: the window runs UNPARTITIONED over the bucket table — that
    * frame is span-sized (≤ ~10³ rows for years of days, each row ≤ k
    * longs), the same bounded class as the changepoint/vocab windows,
    * NEVER the raw data. Merging is associative, so the same sketches
    * also answer monthly/any-window roll-ups without touching the data
    * again.
    */
  def trailingDistinct(sketches: DataFrame, windowLen: Int, k: Int): DataFrame = {
    require(windowLen >= 1, s"windowLen must be >= 1: $windowLen")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("grp").rowsBetween(-(windowLen - 1), 0)
    sketches
      .withColumn("__merged",
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv")).over(w)))),
          1, k))
      .select(col("grp").as("bucket"),
        round(estimateDistinct(col("kmv"), k), 4).as("distinct_est"),
        round(estimateDistinct(col("__merged"), k), 4).as("trailing_est"),
        // window fill: the first windowLen−1 buckets merge FEWER than
        // windowLen days (warm-up) — consumers exclude or flag rows with
        // n_buckets < windowLen rather than compare them to steady state
        count(lit(1)).over(w).as("n_buckets"))
  }
}
