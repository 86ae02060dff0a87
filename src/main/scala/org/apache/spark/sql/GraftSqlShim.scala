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
}
