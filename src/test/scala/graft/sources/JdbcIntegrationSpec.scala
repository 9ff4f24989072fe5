package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.sinks.JdbcUpsert

/** End-to-end JDBC source/sink integration against embedded Derby (ships
  * with Spark) — upgrades S3–S8/L1/L2/L4 from compile-only to exercised:
  * append, truncate-overwrite, partitioned parallel read, and the batched
  * MERGE upsert sink.
  */
class JdbcIntegrationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Jdbc.props("", "", "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().execute(sql) } finally c.close()
  }

  test("L1 append + read back round-trips through a real JDBC database") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("K", "S", "V")
    Jdbc.append(df, url, "T_APPEND", props)
    val back = Jdbc.read(spark, url, "T_APPEND", props)
    assert(back.count() == 3)
    assert(back.orderBy("K").select("S").as[String].collect().toSeq == Seq("a", "b", "c"))
    Jdbc.append(df, url, "T_APPEND", props) // append again: 6 rows
    assert(Jdbc.read(spark, url, "T_APPEND", props).count() == 6)
  }

  test("L2 overwrite truncates and replaces") {
    val df1 = Seq((1L, "x")).toDF("K", "S")
    val df2 = Seq((2L, "y"), (3L, "z")).toDF("K", "S")
    Jdbc.append(df1, url, "T_OVR", props)
    Jdbc.overwrite(df2, url, "T_OVR", props)
    val back = Jdbc.read(spark, url, "T_OVR", props)
    assert(back.count() == 2)
    assert(back.filter(col("K") === 1L).isEmpty)
  }

  test("partitioned parallel read splits into numPartitions range scans") {
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("K", "S")
    Jdbc.append(df, url, "T_PART", props)
    val back = Jdbc.readPartitioned(spark, url, "T_PART", props, "K", 1L, 100L, 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(sum("K")).head().getLong(0) == 5050L)
  }

  test("L6 physical: target-side DELETE passthrough with rolling-retention predicate") {
    val df = (1L to 50L).map(i => (i, i % 40)).toDF("K", "DAY_AGE")
    Jdbc.append(df, url, "T_DEL", props)
    val deleted = Jdbc.deleteWhere(url, "T_DEL", "DAY_AGE > 30", props)
    assert(deleted == df.filter(col("DAY_AGE") > 30).count())
    assert(Jdbc.read(spark, url, "T_DEL", props).count() == 50 - deleted)
  }

  test("streaming Method-2: stream files, MERGE each micro-batch into JDBC; redelivery idempotent") {
    exec("CREATE TABLE T_STREAM (K BIGINT NOT NULL PRIMARY KEY, S VARCHAR(64))")
    val dir = java.nio.file.Files.createTempDirectory("graft_sjdbc")
    val page1 = (1L to 20L).map(i => (i, s"v$i")).toDF("K", "S")
    page1.coalesce(1).write.mode("overwrite").parquet(dir.resolve("p1").toString)
    // flatten: streaming source wants one dir of files
    val flat = java.nio.file.Files.createTempDirectory("graft_sjdbc_flat")
    java.nio.file.Files.list(dir.resolve("p1")).filter(_.toString.endsWith(".parquet"))
      .forEach(p => java.nio.file.Files.copy(p, flat.resolve("a.parquet")))
    graft.streaming.Incremental.streamMergeToJdbc(spark, flat.toString,
      url, "T_STREAM", Seq("K"), "ansi", maxParallelism = 1)
    assert(Jdbc.read(spark, url, "T_STREAM", props).count() == 20)
    // re-run (fresh checkpoint => redelivery): MERGE keeps it idempotent
    graft.streaming.Incremental.streamMergeToJdbc(spark, flat.toString,
      url, "T_STREAM", Seq("K"), "ansi", maxParallelism = 1)
    assert(Jdbc.read(spark, url, "T_STREAM", props).count() == 20)
  }

  test("L4 physical: batched MERGE upsert via foreachPartition") {
    exec("CREATE TABLE T_UPS (K BIGINT NOT NULL PRIMARY KEY, S VARCHAR(32), V DOUBLE)")
    // single partition: embedded Derby handles concurrent MERGE writers
    // poorly (lock contention flakiness); real MySQL/Postgres targets take
    // the partition-parallel path
    val initial = Seq((1L, "old", 1.0), (2L, "keep", 2.0)).toDF("K", "S", "V").coalesce(1)
    JdbcUpsert.write(initial, url, "T_UPS", "", "", keys = Seq("K"), dialect = "ansi")
    val incoming = Seq((1L, "new", 9.0), (3L, "ins", 3.0)).toDF("K", "S", "V").coalesce(1)
    JdbcUpsert.write(incoming, url, "T_UPS", "", "", keys = Seq("K"), dialect = "ansi")
    val back = Jdbc.read(spark, url, "T_UPS", props).orderBy("K").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }
}
