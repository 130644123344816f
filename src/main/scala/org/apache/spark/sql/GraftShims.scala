package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface: building a DataFrame from a custom
  * LogicalPlan (the documented pattern for libraries that add whole
  * operators — a logical node + strategy pair has no public constructor
  * path from the Dataset API). Kept to the single call the graft planner
  * extensions need. */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression bridge for graft's native expressions used
    * directly from the Column API (no registry round-trip — e.g. the
    * portable-hash hot path, where the expression replaces a
    * conv∘substring∘md5 chain in every call site). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
