package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-sketch profiling: Count-Min heavy hitters (Cormode &
  * Muthukrishnan 2005) — the streaming/mergeable answer to "which tokens
  * dominate this corpus" when an exact global count per distinct value is
  * too wide to keep. Companion to the HLL++/percentile sketches already in
  * the profile surface (`corpus_sketch_profile`).
  */
object Sketches {

  /** Top-`topK` values of `colName` by exact count, with each value's
    * Count-Min estimate alongside — the sketch's one-sided error
    * (`est_n ≥ exact_n`, overshoot ≤ eps·N w.p. ≥ confidence) shown
    * against ground truth.
    *
    * Both passes are distributed single aggregates: the exact top-k is a
    * hash aggregate + bounded sort, the sketch is Spark's mergeable
    * `stat.countMinSketch` (per-partition sketches, driver merge). Only
    * the k winner rows and the sketch itself (eps/confidence-sized, KBs)
    * cross the driver — model-state-family collects. Deterministic for a
    * fixed seed: pinnable output.
    */
  def heavyHitters(
      df: DataFrame,
      colName: String,
      topK: Int,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType,
      StringType, StructField, StructType}
    val spark = df.sparkSession
    val dt = df.schema(colName).dataType
    // countMinSketch supports exactly the string + integral types; fail
    // loudly up front instead of a runtime ClassCastException on the
    // winner rows
    require(Seq(StringType, ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"heavyHitters supports string/integral columns, got $dt for '$colName'")
    val exact = df.groupBy(colName).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col(colName)).limit(topK)
    val sketch = df.stat.countMinSketch(colName, eps, confidence, seed)
    // estimateCount dispatches on the item's runtime type (string vs
    // integral), so the winner rows keep their native column type
    val rows = exact.collect().toSeq
      .map(r => Row(r.get(0), r.getLong(1), sketch.estimateCount(r.get(0))))
    val schema = StructType(Seq(StructField(colName, dt),
      StructField("exact_n", LongType), StructField("est_n", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("exact_n").desc, col(colName))
  }
}
