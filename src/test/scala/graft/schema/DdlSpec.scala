package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class DdlSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("amount", DecimalType(38, 9)),
    StructField("price", DoubleType),
    StructField("flag", BooleanType),
    StructField("created", TimestampType),
    StructField("day", DateType)))

  test("M4/M5: SQL Server DDL follows the reference type lattice") {
    val ddl = Ddl.schemaToDdl(schema, "t", SqlDialect.SqlServer)
    assert(ddl.contains("[id] BIGINT NOT NULL"))
    assert(ddl.contains("[name] VARCHAR(255)"))
    assert(ddl.contains("[amount] DECIMAL(38, 9)"))
    assert(ddl.contains("[price] FLOAT"))
    assert(ddl.contains("[flag] BIT"))
    assert(ddl.contains("[created] DATETIME"))
    assert(ddl.contains("[day] DATE"))
    assert(ddl.startsWith("CREATE TABLE [t] ("))
  }

  test("M4: per-dialect quoting and types") {
    val my = Ddl.schemaToDdl(schema, "t", SqlDialect.MySql)
    assert(my.contains("`price` DOUBLE") && my.contains("`flag` TINYINT(1)"))
    val pg = Ddl.schemaToDdl(schema, "t", SqlDialect.Postgres)
    assert(pg.contains("\"price\" DOUBLE PRECISION") && pg.contains("\"flag\" BOOLEAN"))
    val bq = Ddl.schemaToDdl(schema, "t", SqlDialect.BigQuery)
    assert(bq.contains("`id` INT64") && bq.contains("`name` STRING") && bq.contains("`amount` NUMERIC"))
  }

  test("M5: unknown types fall back to VARCHAR(255) / STRING") {
    assert(TypeMap.toDialect(ArrayType(IntegerType), SqlDialect.SqlServer) == "VARCHAR(255)")
    assert(TypeMap.toDialect(ArrayType(IntegerType), SqlDialect.BigQuery) == "STRING")
  }

  test("M6: promotion flags columns containing non-alphanumerics, single pass") {
    val df = Seq(
      ("plain1", "has space", 1L),
      ("plain2", "ascii", 2L)).toDF("clean", "dirty", "ord")
    val promos = Ddl.nvarcharPromotions(df, orderCol = "ord")
    assert(promos == Map("clean" -> false, "dirty" -> true))
  }

  test("M6: promotion metadata drives NVARCHAR in DDL") {
    val s = StructType(Seq(StructField("c", StringType)))
    val marked = Ddl.markNvarchar(s, Map("c" -> true))
    val ddl = Ddl.schemaToDdl(marked, "t", SqlDialect.SqlServer)
    assert(ddl.contains("[c] NVARCHAR(255)"))
  }

  test("M6: sampling respects sampleN bound") {
    val df = (1 to 50).map(i => (if (i > 10) "bad char!" else "clean", i.toLong))
      .toDF("c", "ord")
    // only the first 10 rows (ordered) sampled -> no promotion
    val promos = Ddl.nvarcharPromotions(df, orderCol = "ord", sampleN = 10)
    assert(promos == Map("c" -> false))
  }

  test("M5: the declared m5_type_lattice query is complete and consistent with TypeMap") {
    val rows = graft.SparkEntry.queries("m5_type_lattice")(spark, graft.GraftSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    // 13 spark-type cases × 4 dialects, no dialect missing
    assert(rows.size == 13 * 4)
    assert(rows.keys.map(_._2).toSet == Set("bigquery", "mysql", "postgres", "sqlserver"))
    // spot-check the lattice corners incl. the VARCHAR(255) unknown fallback
    assert(rows(("string_nvarchar", "sqlserver")) == "NVARCHAR(255)")
    assert(rows(("string_nvarchar", "postgres")) == "VARCHAR(255)")
    assert(rows(("decimal_38_9", "bigquery")) == "NUMERIC")
    assert(rows(("decimal_20_10", "bigquery")) == "BIGNUMERIC")
    assert(rows(("boolean", "mysql")) == "TINYINT(1)")
    assert(rows(("fallback_array", "mysql")) == "VARCHAR(255)")
    assert(rows(("fallback_array", "bigquery")) == "STRING")
  }
}
