package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) tables: pre-shuffle fact/dim data ONCE at write
  * time so every subsequent equi-join/aggregation on the bucket key runs
  * shuffle-free (SURVEY §4 / 100 TB posture: a repeatedly-joined 100 TB fact
  * should never re-shuffle per query).
  *
  * Uses native data-source bucketing (`bucketBy` + `saveAsTable`) on the
  * session catalog — Catalyst recognizes matching bucket specs on both sides
  * and plans SortMergeJoin without Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — shuffle-free when both
    * were written with the same bucket count. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String,
                   joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }

  /** True if the EXECUTED plan contains a shuffle exchange (test helper).
    * Runs the frame first: under AQE the physical exchanges only exist in
    * the final adaptive plan. */
  def hasShuffle(df: DataFrame): Boolean = {
    // execute THIS QueryExecution instance (a DataFrameWriter would clone
    // the plan and leave this one un-finalized under AQE), then inspect the
    // final plan string: AQE hides materialized exchanges inside leaf
    // ShuffleQueryStageExec nodes that a children-walk cannot enter
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("ShuffleQueryStage") || plan.contains("ShuffleExchange") ||
      plan.contains("+- Exchange")
  }
}
