package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: skew salting and bucketed co-located joins — the
  * shuffle-management patterns a 100 TB deployment leans on (builder
  * mandate; none exist in the reference, whose "parallelism" is one cursor,
  * BASELINE.md).
  */
object Scale {

  /** Skew-salted equi-join: the skewed LEFT side gets a deterministic salt
    * in [0, saltFactor) derived from its row content; the small-ish RIGHT
    * side is replicated once per salt value. The hot key's rows spread over
    * `saltFactor` reducers instead of one. (AQE's skew-join handles most
    * cases at runtime; explicit salting remains the tool for extreme single
    * keys and for non-AQE paths.)
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toSeq: _*)), lit(saltFactor)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write a bucketed + sorted table: joins/aggregations on the bucket key
    * against an equally-bucketed table need NO shuffle (bucket-local
    * sort-merge). This is the pre-partitioning answer for repeated big-big
    * joins on a stable key.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKey: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back. */
  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
