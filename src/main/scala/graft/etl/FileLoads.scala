package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical file-target load dispositions (SURVEY.md §2.6 L1/L2/L5 on a
  * parquet/lake target). The logical merge semantics live in [[Loads]];
  * these writers map them onto partitioned parquet with the commit-protocol
  * atomicity the reference's delete-then-insert sequences lack
  * (SURVEY.md §7.4 "non-atomic delete+append").
  *
  * Scale design: the target is partitioned by a derived date column, so
  * - the idempotent window refresh (L5) is DYNAMIC PARTITION OVERWRITE —
  *   only the partitions present in the incoming batch rewrite; history
  *   partitions are untouched (no read-modify-write of the whole table);
  * - readers prune partitions on the same column (date-window queries never
  *   scan history).
  */
object FileLoads {

  /** Derive the partition column (`p_date`, yyyy-MM-dd) from an event-time
    * column — daily partitions, the reference's windowing granularity.
    */
  def withDatePartition(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("p_date", date_format(col(dateCol), "yyyy-MM-dd"))

  /** L1: append new files into the partition layout. */
  def append(df: DataFrame, dateCol: String, path: String): Unit =
    withDatePartition(df, dateCol).write
      .partitionBy("p_date").mode(SaveMode.Append).parquet(path)

  /** L2: full truncate-refresh. */
  def overwriteAll(df: DataFrame, dateCol: String, path: String): Unit =
    withDatePartition(df, dateCol).write
      .partitionBy("p_date").mode(SaveMode.Overwrite).parquet(path)

  /** L5: idempotent window refresh as dynamic partition overwrite — ONLY
    * the date partitions present in `incoming` are replaced; everything
    * else is untouched. Re-running with the same input is a no-op
    * semantically (the reference's Method-2 D365→BQ intent,
    * `Template-to-BigQuery/Dynamics365-to-BigQuery-Method-2.py:82-92`,
    * without its delete/append non-atomicity).
    */
  def refreshWindow(spark: SparkSession, incoming: DataFrame, dateCol: String, path: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      withDatePartition(incoming, dateCol).write
        .partitionBy("p_date").mode(SaveMode.Overwrite).parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Read back a partitioned target with partition pruning on `p_date`. */
  def readWindow(spark: SparkSession, path: String, fromDate: String): DataFrame =
    spark.read.parquet(path).filter(col("p_date") >= fromDate)
}
