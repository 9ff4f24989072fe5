package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Row-level sanitization transforms (SURVEY.md §2.3).
  *
  * - T1: ±Inf → NULL on every floating-point column. The reference applies
  *   `df.replace([float('inf'), float('-inf')], None)` to every extracted
  *   frame before loading, because the target DBs reject infinities
  *   (reference `Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:58` and 11
  *   clone sites). NaN is deliberately left untouched — the reference only
  *   replaces the two infinities.
  * - P2: tolerant column drop — the reference strips the OData `@odata.etag`
  *   metadata column with `errors='ignore'`
  *   (`Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:78`); Spark's
  *   `drop` is already absence-tolerant.
  *
  * Both are pure Column-expression rewrites: they stay inside whole-stage
  * codegen, add no shuffle, and never touch the driver.
  */
object Sanitize {

  /** ±Inf → NULL for one floating-point column. */
  def infToNull(c: Column): Column =
    when(c === Double.PositiveInfinity || c === Double.NegativeInfinity, lit(null))
      .otherwise(c)

  /** T1: apply [[infToNull]] to every DoubleType/FloatType column; all other
    * columns pass through untouched. Schema-driven, like the reference's
    * whole-frame `df.replace`.
    */
  def sanitizeInf(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType => infToNull(col(f.name)).as(f.name)
        case _                      => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** P2: drop columns, tolerating absence (reference `errors='ignore'`). */
  def dropColumns(df: DataFrame, names: String*): DataFrame =
    df.drop(names: _*)
}
