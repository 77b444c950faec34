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
  * plus one `private[spark]` one:
  *
  *   - a serializable Hadoop-filesystem opener (the executor-side
  *     deletion-vector sidecar read needs the session's Hadoop conf on
  *     executors; `SerializableConfiguration` is the canonical vehicle
  *     every Spark datasource uses and has no public twin).
  *
  * Nothing else of Spark's internals is reached through here — keep it
  * that way: every use site is a place the public API genuinely has no
  * door, not a convenience. */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The inverse of [[ofRows]]: a DataFrame's analyzed logical plan —
    * what a table-valued-function builder must return (the table_changes
    * TVF builds its result as a DataFrame and hands the analyzer the
    * plan). */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** A serializable `path => InputStream` bound to this session's Hadoop
    * configuration (broadcast once; the closure ships with tasks). */
  def serializableHadoopOpen(spark: SparkSession): String => java.io.InputStream = {
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    (path: String) => {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(bc.value.value).open(p)
    }
  }

  /** The write twin of [[serializableHadoopOpen]]: a serializable
    * `path => OutputStream` with create-new semantics (overwrite=false —
    * fresh-UUID writers must never clobber), for executor-side
    * deletion-vector sidecar writes. Parent directories are created as
    * needed (Hadoop `create` semantics). */
  def serializableHadoopCreate(spark: SparkSession): String => java.io.OutputStream = {
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    (path: String) => {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(bc.value.value).create(p, false)
    }
  }
}
