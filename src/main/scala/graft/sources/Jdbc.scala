package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink wrappers (SURVEY.md §2.1 S3–S8, §2.6 L1).
  *
  * The reference opens one cursor per pipeline (single-threaded extract,
  * e.g. `Template-to-MySQL/SQLServer-to-MySQL-Method-1.py:48-63`); here the
  * read is partitioned (`partitionColumn`/`numPartitions`) so a 100 TB-class
  * table fans out across executors, and predicate pushdown happens via
  * Catalyst (`JDBCRDD.compileFilter`) instead of hand-written dialect SQL.
  *
  * Untested in this harness (no live DBs, zero egress) — parquet fixtures
  * stand in; the logic that IS testable (windows, sanitize, merges) lives in
  * `graft.etl` and composes with these readers unchanged.
  */
object Jdbc {

  def props(user: String, password: String, driver: String): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", driver)
    p
  }

  /** Plain read — Spark fetches schema from DB metadata (the reference's
    * inferred-at-extract semantics, SURVEY.md §1.2).
    */
  def read(spark: SparkSession, url: String, table: String, p: Properties): DataFrame =
    spark.read.jdbc(url, table, p)

  /** Partitioned parallel read — the scale path the reference lacks
    * (1 connection/1 cursor, BASELINE.md). Stride-partitions `partitionCol`
    * into `numPartitions` concurrent range scans.
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      p: Properties,
      partitionCol: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lowerBound, upperBound, numPartitions, p)

  /** L1: batched append (reference `executemany`,
    * `Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:81`). Spark's JDBC
    * writer batches with `batchsize` per partition — same semantics,
    * parallel over partitions.
    */
  def append(df: DataFrame, url: String, table: String, p: Properties, batchSize: Int = 1000): Unit =
    df.write.mode(SaveMode.Append).option("batchsize", batchSize).jdbc(url, table, p)

  /** L2: truncate-refresh (reference `WRITE_TRUNCATE`). `truncate=true`
    * keeps the target table's DDL instead of drop+recreate.
    */
  def overwrite(df: DataFrame, url: String, table: String, p: Properties): Unit =
    df.write.mode(SaveMode.Overwrite).option("truncate", "true").jdbc(url, table, p)

  /** L6 physical: target-side DELETE passthrough (the reference's
    * `DELETE FROM t WHERE date_trans < …` maintenance step,
    * `Template-to-MySQL/BigQuery-to-MySQL-Method-2.py:77`). Executes on the
    * target in its own SQL; returns deleted-row count. Driver-side single
    * statement — the predicate does the work inside the DB, exactly like
    * the reference.
    */
  def deleteWhere(url: String, table: String, predicateSql: String, p: Properties): Int = {
    val conn = java.sql.DriverManager.getConnection(url, p)
    try {
      conn.createStatement().executeUpdate(s"DELETE FROM $table WHERE $predicateSql")
    } finally conn.close()
  }
}
