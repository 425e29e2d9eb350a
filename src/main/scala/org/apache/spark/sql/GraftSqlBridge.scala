package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` expression-opaque (it wraps a ColumnNode);
  * the Column⇄Expression converters live in the `private[sql]`
  * `classic.ExpressionUtils`. This bridge re-exports just those two
  * conversions to the graft packages so custom Catalyst expressions
  * (e.g. graft.functions.ImageStats) can surface as Columns. Public
  * Spark API + source only — no other internals touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
