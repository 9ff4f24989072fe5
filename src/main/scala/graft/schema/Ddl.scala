package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M4 + M6: CREATE TABLE DDL synthesis and data-driven NVARCHAR promotion
  * (SURVEY.md §2.8).
  *
  * The reference introspects schemas (`INFORMATION_SCHEMA.COLUMNS`,
  * `DESCRIBE`) and folds them into `CREATE TABLE` text
  * (`Automatic Query for Create Table.ipynb` cells 1/3/5). In Spark the
  * introspection side is free — `df.schema` IS the StructType — so only the
  * fold (M4) and the promotion sampler (M6) remain.
  */
object Ddl {

  /** M4: fold a StructType into `CREATE TABLE` DDL for a dialect.
    * NVARCHAR promotion and varchar width are read from column metadata
    * ([[TypeMap.NvarcharKey]]/[[TypeMap.WidthKey]]), where
    * [[markNvarchar]] puts them.
    */
  def schemaToDdl(schema: StructType, table: String, dialect: SqlDialect): String = {
    val cols = schema.fields.map { f =>
      val nv = f.metadata.contains(TypeMap.NvarcharKey) &&
        f.metadata.getBoolean(TypeMap.NvarcharKey)
      val width =
        if (f.metadata.contains(TypeMap.WidthKey)) f.metadata.getLong(TypeMap.WidthKey).toInt
        else 255
      val t = TypeMap.toDialect(f.dataType, dialect, nvarchar = nv, width = width)
      val nullSql = if (f.nullable) "" else " NOT NULL"
      s"  ${quoteIdent(f.name, dialect)} $t$nullSql"
    }
    s"CREATE TABLE ${quoteIdent(table, dialect)} (\n${cols.mkString(",\n")}\n);"
  }

  private def quoteIdent(name: String, dialect: SqlDialect): String = dialect match {
    case SqlDialect.SqlServer => s"[$name]"
    case SqlDialect.BigQuery  => s"`$name`"
    case SqlDialect.MySql     => s"`$name`"
    case SqlDialect.Postgres  => "\"" + name + "\""
  }

  /** M6 detection predicate, per column: does any sampled value contain a
    * character outside `[a-zA-Z0-9]`? (reference regex
    * `re.search(r'[^a-zA-Z0-9]', data)`, ipynb cell 3).
    */
  def needsNvarchar(c: Column): Column =
    max(when(c.rlike("[^a-zA-Z0-9]"), lit(1)).otherwise(lit(0)))

  /** M6: sample up to `sampleN` rows (ordered by `orderCol` for determinism —
    * the reference's bare `LIMIT 1000` is order-undefined) and decide
    * promotion for every string column IN ONE PASS. The reference issues one
    * `SELECT col FROM t LIMIT 1000` per column (N+1 query pattern, ipynb
    * cell 3); here it is a single aggregate job over the sample.
    */
  def nvarcharPromotions(df: DataFrame, orderCol: String, sampleN: Int = 1000): Map[String, Boolean] = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) return Map.empty
    val sample = df.orderBy(col(orderCol)).limit(sampleN)
    val aggs = stringCols.map(c => needsNvarchar(col(c)).as(c))
    val row = sample.agg(aggs.head, aggs.tail.toSeq: _*).head()
    stringCols.zipWithIndex.map { case (c, i) => c -> (row.getInt(i) == 1) }.toMap
  }

  /** Inverse of [[schemaToDdl]]: parse generated `CREATE TABLE` text back
    * into a StructType (property-tested round trip, SURVEY.md §5.3). The
    * mapping is lossy where dialects merge Spark types (e.g. SQL Server
    * `FLOAT` covers DoubleType); the inverse picks the canonical wider
    * type, and the round-trip property is stated over the types that map
    * 1:1 per dialect.
    */
  def ddlToSchema(ddl: String, dialect: SqlDialect): StructType = {
    val body = ddl.substring(ddl.indexOf('(') + 1, ddl.lastIndexOf(')'))
    val colLines = body.split(",\n").map(_.trim).filter(_.nonEmpty)
    val identRe = dialect match {
      case SqlDialect.SqlServer => """\[([^\]]+)\]\s+(.+)""".r
      case SqlDialect.Postgres  => "\"([^\"]+)\"\\s+(.+)".r
      case _                    => """`([^`]+)`\s+(.+)""".r
    }
    StructType(colLines.map { line =>
      val identRe(name, rest0) = line: @unchecked
      val notNull = rest0.endsWith(" NOT NULL")
      val typeStr = (if (notNull) rest0.dropRight(" NOT NULL".length) else rest0).trim
      val (dt, meta) = parseType(typeStr)
      StructField(name, dt, nullable = !notNull, metadata = meta)
    })
  }

  private val VarcharRe = """(?i)(N?)VARCHAR\((\d+)\)""".r
  private val DecimalRe = """(?i)DECIMAL\((\d+),\s*(\d+)\)""".r

  private def parseType(t: String): (DataType, Metadata) = t match {
    case VarcharRe(n, w) =>
      val b = new MetadataBuilder().putLong(TypeMap.WidthKey, w.toLong)
      if (n.nonEmpty) b.putBoolean(TypeMap.NvarcharKey, true)
      (StringType, b.build())
    case DecimalRe(p, s) => (DecimalType(p.toInt, s.toInt), Metadata.empty)
    case other => (other.toUpperCase match {
      case "BIGINT" | "INT64"               => LongType
      case "INT" | "INTEGER"                => IntegerType
      case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT64" | "FLOAT" => DoubleType
      case "REAL"                           => FloatType
      case "BIT" | "TINYINT(1)" | "BOOLEAN" | "BOOL" => BooleanType
      case "DATETIME" | "TIMESTAMP"         => TimestampType
      case "DATE"                           => DateType
      case "NUMERIC" | "BIGNUMERIC"         => DecimalType(38, 9)
      case "VARBINARY(MAX)" | "LONGBLOB" | "BYTEA" | "BYTES" => BinaryType
      case "STRING"                         => StringType
      case _                                => StringType
    }, Metadata.empty)
  }

  /** Stamp [[nvarcharPromotions]] results into the schema's column metadata
    * so [[schemaToDdl]] picks them up.
    */
  def markNvarchar(schema: StructType, promotions: Map[String, Boolean]): StructType =
    StructType(schema.fields.map { f =>
      if (promotions.getOrElse(f.name, false)) {
        val md = new MetadataBuilder().withMetadata(f.metadata)
          .putBoolean(TypeMap.NvarcharKey, true).build()
        f.copy(metadata = md)
      } else f
    })
}
