package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the classic
  * bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is private[sql],
  * so this shim lives inside the sql package namespace — the standard way
  * for third-party Catalyst extensions to expose custom Expressions as
  * Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
