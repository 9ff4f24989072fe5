package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** M1–M3: schema introspection (SURVEY.md §2.8).
  *
  * The reference queries `INFORMATION_SCHEMA.COLUMNS` (SQL Server, notebook
  * cell 1), `DESCRIBE` (MySQL, cell 3) and BigQuery `INFORMATION_SCHEMA`
  * (cell 5), shipping one network round-trip per table (plus an N+1 wave
  * for NVARCHAR sampling). In Spark the schema IS local metadata
  * (`df.schema`); this module renders it in the reference's
  * INFORMATION_SCHEMA row shape so downstream DDL tooling (M4) composes.
  */
object Introspect {

  /** ANSI-ish type name for the INFORMATION_SCHEMA rendering (also what the
    * DuckDB oracle reports for the same parquet).
    */
  def ansiTypeName(dt: DataType): String = dt match {
    case LongType                        => "BIGINT"
    case IntegerType                     => "INTEGER"
    case ShortType                       => "SMALLINT"
    case ByteType                        => "TINYINT"
    case DoubleType                      => "DOUBLE"
    case FloatType                       => "FLOAT"
    case StringType                      => "VARCHAR"
    case BooleanType                     => "BOOLEAN"
    case DateType                        => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BinaryType                      => "BLOB"
    case d: DecimalType                  => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(et, _)                => s"${ansiTypeName(et)}[]"
    case _                               => "VARCHAR"
  }

  /** INFORMATION_SCHEMA.COLUMNS-shaped introspection of any DataFrame:
    * (column_name, ordinal_position, data_type, is_nullable).
    */
  def columns(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.schema.fields.zipWithIndex.map { case (f, i) =>
      (f.name, (i + 1).toLong, ansiTypeName(f.dataType), if (f.nullable) "YES" else "NO")
    }.toSeq.toDF("column_name", "ordinal_position", "data_type", "is_nullable")
  }
}
