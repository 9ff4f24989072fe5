package graft.schema

import org.apache.spark.sql.types._

/** M5: cross-dialect type mapping (SURVEY.md §2.8, §1.3).
  *
  * The reference's only explicit type system is the BigQuery→SQL Server dict
  * in `Automatic Query for Create Table.ipynb` cell 5 (`data_type_mapping`:
  * STRING→VARCHAR(255), INT64→BIGINT, FLOAT64→FLOAT, BOOL→BIT,
  * NUMERIC/BIGNUMERIC→DECIMAL(38,9), TIMESTAMP→DATETIME, DATE→DATE,
  * TIME→TIME, fallback VARCHAR(255)). Here the lattice is re-expressed from
  * Spark's `DataType` algebra out to each dialect the reference touches.
  */
sealed trait SqlDialect { def name: String }
object SqlDialect {
  case object MySql     extends SqlDialect { val name = "mysql" }
  case object SqlServer extends SqlDialect { val name = "sqlserver" }
  case object Postgres  extends SqlDialect { val name = "postgres" }
  case object BigQuery  extends SqlDialect { val name = "bigquery" }
  val all: Seq[SqlDialect] = Seq(MySql, SqlServer, Postgres, BigQuery)
}

object TypeMap {
  import SqlDialect._

  /** Metadata key: a string column flagged for national-varchar promotion
    * (M6). Spark's StringType has no unicode-width notion, so the flag rides
    * in column metadata (SURVEY.md §7.4).
    */
  val NvarcharKey = "graft.nvarchar"
  /** Metadata key: explicit varchar width carried for DDL generation. */
  val WidthKey = "graft.varchar_len"

  /** Map one Spark type to a dialect type string. `nvarchar`/`width` apply
    * to string columns only (reference promotes `varchar`→`NVARCHAR`, ipynb
    * cell 3; default width 255 mirrors the reference fallback
    * `VARCHAR(255)`).
    */
  def toDialect(
      dt: DataType,
      dialect: SqlDialect,
      nvarchar: Boolean = false,
      width: Int = 255): String = dt match {
    case StringType =>
      dialect match {
        case SqlServer if nvarchar => s"NVARCHAR($width)"
        case SqlServer             => s"VARCHAR($width)"
        case MySql if nvarchar     => s"NVARCHAR($width)"
        case MySql                 => s"VARCHAR($width)"
        case Postgres              => s"VARCHAR($width)"
        case BigQuery              => "STRING"
      }
    case c: CharType    => toDialect(StringType, dialect, nvarchar, c.length)
    case v: VarcharType => toDialect(StringType, dialect, nvarchar, v.length)
    case ByteType | ShortType | IntegerType =>
      dialect match {
        case BigQuery => "INT64"
        case _        => "INT"
      }
    case LongType =>
      dialect match {
        case BigQuery => "INT64"
        case _        => "BIGINT"
      }
    case FloatType =>
      dialect match {
        case BigQuery  => "FLOAT64"
        case SqlServer => "FLOAT"
        case MySql     => "FLOAT"
        case Postgres  => "REAL"
      }
    case DoubleType =>
      dialect match {
        case BigQuery  => "FLOAT64"
        case SqlServer => "FLOAT"
        case MySql     => "DOUBLE"
        case Postgres  => "DOUBLE PRECISION"
      }
    case d: DecimalType =>
      dialect match {
        case BigQuery => if (d.precision <= 38 && d.scale <= 9) "NUMERIC" else "BIGNUMERIC"
        case _        => s"DECIMAL(${d.precision}, ${d.scale})"
      }
    case BooleanType =>
      dialect match {
        case SqlServer => "BIT"
        case MySql     => "TINYINT(1)"
        case Postgres  => "BOOLEAN"
        case BigQuery  => "BOOL"
      }
    case TimestampType | TimestampNTZType =>
      dialect match {
        case SqlServer => "DATETIME"
        case MySql     => "DATETIME"
        case Postgres  => "TIMESTAMP"
        case BigQuery  => "TIMESTAMP"
      }
    case DateType   => "DATE"
    case BinaryType =>
      dialect match {
        case SqlServer => "VARBINARY(MAX)"
        case MySql     => "LONGBLOB"
        case Postgres  => "BYTEA"
        case BigQuery  => "BYTES"
      }
    case _ =>
      // Reference fallback: unknown → VARCHAR(255) (ipynb cell 5,
      // `.get(..., "VARCHAR(255)")`); BigQuery's analogue is STRING.
      dialect match {
        case BigQuery => "STRING"
        case _        => "VARCHAR(255)"
      }
  }
}
