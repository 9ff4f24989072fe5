package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture/table readers.
  *
  * In the harness every source system of the reference (BigQuery, SQL Server,
  * PostgreSQL, MySQL — reference `Template-to-MySQL/&#42;-Method-1.py` extract
  * phases) is stood in by parquet tables (TESTDATA.md). Real deployments use
  * [[Jdbc]] for the four relational systems and [[JsonRecords]] for the OData
  * entity shape.
  *
  * Scale note: parquet scans are split by Spark into
  * `spark.sql.files.maxPartitionBytes` chunks, so a 100 TB table parallelizes
  * across all executors with no code change here. Column pruning + predicate
  * pushdown reach the scan automatically because callers compose filters
  * lazily on the returned DataFrame.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) cannot hold: read it as raw nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs — the same
    * ns→µs truncation DuckDB applies reading the file (FIXTURES.md §C).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer division (`div`), NOT `/`: double division loses µs precision
    // at 1.7e18-scale nanos (observed ±1 µs vs DuckDB's truncation)
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
