package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ⇄ catalyst Expression converters
  * (Spark 4 removed the public `Column(expr)` constructor / `.expr`).
  * Needed to expose custom Catalyst expressions (graft.functions.
  * NativeText) through the public Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
