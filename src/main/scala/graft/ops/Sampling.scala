package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * All assignment is HASH-based on stable keys — no RNG, no
  * `df.randomSplit` (whose assignment changes with partitioning): a row's
  * split never changes as the corpus grows, across runs, or across
  * engines, which is the property data pipelines actually need
  * (reproducible held-out sets, no train/test leakage on re-ingest).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform [0,1) weight from the key columns (xxhash64 → bucket /
    * buckets).
    */
  def hashWeight(keys: Column*): Column =
    pmod(xxhash64(keys: _*), lit(Buckets)).cast("double") / Buckets.toDouble

  /** Assign 'train' / 'test' by hashed key: rows with weight <
    * `testFraction` go to test. Disjoint, exhaustive, stable.
    */
  def trainTestSplit(df: DataFrame, testFraction: Double, keys: Column*): DataFrame =
    df.withColumn("split",
      when(hashWeight(keys: _*) < testFraction, lit("test")).otherwise(lit("train")))

  /** Deterministic fraction-per-stratum sampling: keep a row iff its hash
    * weight (salted by the stratum so strata sample independently) falls
    * below `fraction`.
    */
  def stratifiedSample(df: DataFrame, strataCol: Column, fraction: Double, keys: Column*): DataFrame =
    df.filter(hashWeight((strataCol +: keys): _*) < fraction)

  /** Weighted source mixing for corpus composition (the
    * temperature-weighted source mix of public pretraining recipes — e.g.
    * the GPT-3 / Pile corpus-weighting scheme): each row is emitted
    * `floor(rate)` times plus one more with probability `frac(rate)`, where
    * `rate` is its source's mixing rate (`defaultRate` when absent from the
    * map). Subsumes downsampling (rate < 1 keeps that fraction) and integer
    * or fractional upsampling (rate 2.3 → 2 or 3 copies).
    *
    * Deterministic: the fractional decision is the same stable hash as the
    * rest of this object (salted by the source so sources decide
    * independently) — the mix is reproducible row-for-row across runs,
    * partitionings, and engines. Emission is one generator expression
    * (`explode` of a per-row `sequence`), map-side fused into the scan: no
    * shuffle, no driver involvement, bounded 1 + floor(rate) fan-out.
    * Output carries a `copy` index (0-based) so upsampled replicas remain
    * distinguishable downstream (e.g. for per-epoch shuffling salts).
    */
  def mixSources(
      df: DataFrame,
      sourceCol: Column,
      rates: Map[String, Double],
      defaultRate: Double,
      keys: Column*): DataFrame = {
    require(defaultRate >= 0, s"defaultRate must be >= 0: $defaultRate")
    rates.foreach { case (s, r) => require(r >= 0, s"rate for '$s' must be >= 0: $r") }
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (srcVal, r)) =>
      when(sourceCol === lit(srcVal), lit(r)).otherwise(acc)
    }
    val whole = floor(rate).cast("bigint")
    val fracPart = rate - floor(rate)
    val copies = whole +
      when(hashWeight((sourceCol +: keys): _*) < fracPart, lit(1L)).otherwise(lit(0L))
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic per-stratum token-budget cap (the "sample each source
    * down to N tokens" step of corpus-mixing recipes): rows are ordered
    * within each stratum by `order` — pass [[hashWeight]] plus an id
    * tiebreak for an unbiased deterministic sample, or an explicit column
    * (e.g. the id, or quality descending for a best-first budget) — the
    * running token total is computed, and a row survives iff its INCLUSIVE
    * running total stays within `budget`: the greedy prefix that never
    * exceeds the budget. A row larger than the remaining budget is dropped
    * and does NOT refill from later rows — selection stays order-monotone,
    * so a row's fate never changes when the corpus grows past it.
    *
    * Output adds `cum_tokens` (the inclusive running total) for per-stratum
    * utilization audits.
    *
    * Scale: ONE shuffle by stratum + an in-partition (external) sort;
    * strata cap independently in parallel. For a single corpus-sized
    * stratum the unpartitioned window would serialize — use the two-level
    * distributed prefix sum of [[Packing.packChunks]] (range buckets +
    * bucket-offset roll-up) for that shape instead.
    */
  def tokenBudget(
      df: DataFrame,
      strataCol: Column,
      tokensCol: Column,
      budget: Long,
      order: Column*): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(order.nonEmpty, "tokenBudget needs a deterministic in-stratum order")
    val w = Window.partitionBy(strataCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol.cast("bigint")).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
