package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and Catalyst `Expression` for custom
  * expressions. Spark 4 made `Column` wrap an opaque ColumnNode and gated
  * the Expression bridge behind `private[sql] ExpressionUtils`; this shim
  * lives under `org.apache.spark.sql` solely to re-export the two
  * conversions for graft's native expressions (e.g.
  * `graft.functions.DotProduct`).
  */
object ColumnInterop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
