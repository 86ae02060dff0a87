package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `Dataset.ofRows` (package-private in Spark): lets graft turn
  * a hand-built [[LogicalPlan]] back into a [[DataFrame]]. Used by the
  * time-travel rewrite, which splices snapshot-pinned relations into a
  * parsed statement's plan instead of editing SQL text — the standard
  * pattern for Spark extension libraries that manipulate plans.
  */
object GraftSqlShim {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Parse a SQL statement to its unresolved logical plan. */
  def parsePlan(spark: SparkSession, stmt: String): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser.parsePlan(stmt)

  /** The Catalyst expression behind a [[Column]] (Spark 4 wraps columns in
    * ColumnNodes; the converter lives behind `private[sql]`). Used by the
    * store's min/max file pruning to walk predicate trees. */
  def expression(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(col)

  /** Wrap a Catalyst expression back into a [[Column]] (the inverse of
    * [[expression]]) — lets a parsed WHERE condition drive the store's
    * partition pruning. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
