package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for the private[sql] Column<->Expression converters — the
  * supported way for a library to wrap its own Catalyst expressions as
  * Columns in Spark 4's ColumnNode world. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
