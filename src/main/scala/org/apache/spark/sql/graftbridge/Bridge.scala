package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for `private[sql]` Column<->Expression and
  * DataFrame<->LogicalPlan conversion — the supported way for third-party
  * Catalyst expressions/operators to expose a Column/DataFrame API in
  * Spark 4 (the helpers live behind package-private visibility, so
  * extension libraries host a bridge in an `org.apache.spark.sql`
  * subpackage).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The analyzed logical plan behind a DataFrame (resolved attributes —
    * safe to reference from a custom operator node).
    */
  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a (custom) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
