package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Two `private[sql]` seams the TxLog SQL-DML strategy needs, exposed
  * through the standard extension-package pattern (a bridge object inside
  * `org.apache.spark.sql`, as public Spark extensions like Delta do):
  *
  *   - a resolved `LogicalPlan` → `DataFrame` (the MERGE source relation
  *     must become the [[graft.etl.TxLog.merge]] source frame), and
  *   - a catalyst `Expression` → user-facing `Column` (Spark 4 removed
  *     the public Column(expr) constructor in the column-node refactor).
  *
  * Nothing else of Spark's internals is reached through here — keep it
  * that way: every use site is a place the public API genuinely has no
  * door, not a convenience. */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
