package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4
  * moved Column to a ColumnNode wrapper; `classic.ExpressionUtils` is the
  * supported conversion but is sql-private). Standard extension-library
  * technique: a single shim object in the org.apache.spark.sql package.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
