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
  * Untestable in this harness (no live DB) — compiled, not exercised.
  */
object JdbcUpsert {

  /** Build the dialect upsert statement for one row of `cols`. */
  private[sinks] def upsertSql(table: String, cols: Seq[String], dialect: String, keys: Seq[String]): String = {
    val collist = cols.mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    dialect match {
      case "mysql" =>
        val updates = cols.filterNot(keys.contains).map(c => s"$c = VALUES($c)").mkString(", ")
        s"INSERT INTO $table ($collist) VALUES ($placeholders) ON DUPLICATE KEY UPDATE $updates"
      case "postgres" =>
        val updates = cols.filterNot(keys.contains).map(c => s"$c = EXCLUDED.$c").mkString(", ")
        s"INSERT INTO $table ($collist) VALUES ($placeholders) ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET $updates"
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
    val sql = upsertSql(table, cols, dialect, keys)
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            cols.indices.foreach(i => st.setObject(i + 1, r.get(i)))
            st.addBatch()
            n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
