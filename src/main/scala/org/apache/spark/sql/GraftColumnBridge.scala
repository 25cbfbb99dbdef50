package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions of
  * Spark 4 (`org.apache.spark.sql.classic.ExpressionUtils`) so graft's
  * custom Catalyst expressions can be exposed as `Column`s. Lives in the
  * `org.apache.spark.sql` package solely for access — the standard
  * pattern for Spark extension libraries. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
