package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame

/** L4 physical: JDBC upsert sink (SURVEY.md §7.4).
  *
  * Spark's built-in JDBC writer has no upsert mode; the reference does
  * row-at-a-time `INSERT … ON DUPLICATE KEY UPDATE` via `df.iterrows()`
  * (`Template-to-MySQL/PgSQL-to-MySQL-Method-1.py:76-82`) — one network
  * round-trip per row. This sink runs per-partition batched upserts
  * (`addBatch`/`executeBatch`) on executor-local connections: the logical
  * merge ([[graft.etl.Loads.upsert]]) stays the tested surface; this is the
  * physical escape hatch for real MySQL/Postgres targets.
  *
  * Exercised end-to-end in tests against embedded Derby (the `ansi` MERGE
  * dialect); MySQL/Postgres dialects share the same batching path.
  */
object JdbcUpsert {

  /** Build the dialect upsert statement plus the column-name order its
    * `?` placeholders bind in (dialects differ: MySQL/Postgres bind each
    * row once; MERGE binds keys in ON, non-keys in UPDATE, all in INSERT).
    */
  private[sinks] def upsertSpec(
      table: String,
      cols: Seq[String],
      dialect: String,
      keys: Seq[String]): (String, Seq[String]) = {
    val collist = cols.mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    val nonKeys = cols.filterNot(keys.contains)
    dialect match {
      case "mysql" =>
        val updates = nonKeys.map(c => s"$c = VALUES($c)").mkString(", ")
        (s"INSERT INTO $table ($collist) VALUES ($placeholders) ON DUPLICATE KEY UPDATE $updates",
          cols)
      case "postgres" =>
        val updates = nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
        (s"INSERT INTO $table ($collist) VALUES ($placeholders) ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET $updates",
          cols)
      case "ansi" =>
        // standard MERGE with a one-row dummy source (Derby rejects VALUES
        // as a MERGE source; SYSIBM.SYSDUMMY1 is the portable DB2/Derby form)
        val on = keys.map(k => s"t.$k = ?").mkString(" AND ")
        val updates = nonKeys.map(c => s"t.$c = ?").mkString(", ")
        (s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 s ON $on " +
          s"WHEN MATCHED THEN UPDATE SET $updates " +
          s"WHEN NOT MATCHED THEN INSERT ($collist) VALUES ($placeholders)",
          keys ++ nonKeys ++ cols)
      case other => throw new IllegalArgumentException(s"no upsert dialect: $other")
    }
  }

  def write(
      df: DataFrame,
      url: String,
      table: String,
      user: String,
      password: String,
      keys: Seq[String],
      dialect: String = "mysql",
      batchSize: Int = 1000): Unit = {
    val cols = df.schema.fieldNames.toSeq
    val (sql, paramOrder) = upsertSpec(table, cols, dialect, keys)
    val paramIdx = paramOrder.map(cols.indexOf).toArray
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { r =>
              paramIdx.zipWithIndex.foreach { case (ci, p) => st.setObject(p + 1, r.get(ci)) }
              st.addBatch()
              n += 1
              if (n % batchSize == 0) st.executeBatch()
            }
            st.executeBatch()
            conn.commit()
          } catch {
            // a failed partition must leave NO half-applied batch: closing an
            // uncommitted connection leaves disposition to driver defaults
            // (some commit on close) — roll back explicitly, then rethrow so
            // Spark retries/fails the task
            case e: Throwable =>
              try conn.rollback() catch { case _: Throwable => () }
              throw e
          } finally st.close()
        } finally conn.close()
      }
    }
  }
}
