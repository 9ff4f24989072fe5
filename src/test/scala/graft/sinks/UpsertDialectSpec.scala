package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

/** Snapshot tests for the MySQL/Postgres upsert dialect legs, which no
  * integration test executes (Derby only runs the `ansi` MERGE path): pin
  * the generated SQL and the `?`-placeholder bind order so a dialect
  * regression is caught without a live target.
  */
class UpsertDialectSpec extends AnyFunSuite {

  private val cols = Seq("id", "region", "amount")
  private val keys = Seq("id")

  test("mysql dialect: INSERT .. ON DUPLICATE KEY UPDATE, binds row once in column order") {
    val (sql, order) = JdbcUpsert.upsertSpec("t", cols, "mysql", keys)
    assert(sql ==
      "INSERT INTO t (id, region, amount) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE region = VALUES(region), amount = VALUES(amount)")
    assert(order == cols)
  }

  test("postgres dialect: INSERT .. ON CONFLICT DO UPDATE with EXCLUDED refs") {
    val (sql, order) = JdbcUpsert.upsertSpec("t", cols, "postgres", keys)
    assert(sql ==
      "INSERT INTO t (id, region, amount) VALUES (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET region = EXCLUDED.region, amount = EXCLUDED.amount")
    assert(order == cols)
  }

  test("postgres dialect: composite keys render in the ON CONFLICT list") {
    val (sql, _) = JdbcUpsert.upsertSpec("t", Seq("a", "b", "v"), "postgres", Seq("a", "b"))
    assert(sql.contains("ON CONFLICT (a, b) DO UPDATE SET v = EXCLUDED.v"))
  }

  test("ansi dialect: MERGE binds keys (ON), then non-keys (UPDATE), then all (INSERT)") {
    val (sql, order) = JdbcUpsert.upsertSpec("t", cols, "ansi", keys)
    assert(sql ==
      "MERGE INTO t t USING SYSIBM.SYSDUMMY1 s ON t.id = ? " +
        "WHEN MATCHED THEN UPDATE SET t.region = ?, t.amount = ? " +
        "WHEN NOT MATCHED THEN INSERT (id, region, amount) VALUES (?, ?, ?)")
    assert(order == Seq("id", "region", "amount", "id", "region", "amount"))
  }

  test("unknown dialect rejected") {
    assertThrows[IllegalArgumentException](JdbcUpsert.upsertSpec("t", cols, "oracle", keys))
  }
}
