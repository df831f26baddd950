package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge.
  *
  * Spark 4's Column wraps a ColumnNode and the conversion helpers
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so
  * custom Catalyst expressions need a shim inside an `org.apache.spark.sql`
  * subpackage — the usual pattern for Spark extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
