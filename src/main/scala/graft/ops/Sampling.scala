package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
