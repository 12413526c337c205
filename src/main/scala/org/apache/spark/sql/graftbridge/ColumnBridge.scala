package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge for graft's custom Catalyst expressions.
 * Spark 4 moved these conversions behind `private[sql]`
 * (`org.apache.spark.sql.classic.ExpressionUtils`); the supported way for
 * a library to reach them without a session-wired FunctionRegistry is a
 * bridge object inside an `org.apache.spark.sql` subpackage — the same
 * pattern Spark connector/extension libraries use.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
