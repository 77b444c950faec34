package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** The one `private[sql]` seam the native streaming sink needs, isolated
  * in Spark's package namespace the way every production table format
  * does it (public Delta/Iceberg both ship `org.apache.spark.sql.delta` /
  * `...execution.datasources.v2` members for the same reason).
  *
  * Why this exists: the Dataset a V1 `Sink.addBatch` receives wraps the
  * micro-batch's already-planned IncrementalExecution. Re-planning it
  * through a batch writer (`df.write`, or TxLog's staged parquet write)
  * would re-resolve the STREAMING logical plan and fail ("queries with
  * streaming sources must be executed with writeStream.start()"). Spark's
  * own ForeachBatchSink solves this by rebinding the executed RDD as a
  * non-streaming leaf; this is the same rebind, built from the two
  * `private[sql]` members it uses (`QueryExecution.toRdd`,
  * `SparkSession.internalCreateDataFrame`).
  *
  * Scale shape: zero data movement — the rebind wraps the micro-batch's
  * physical RDD, so the downstream parquet staging write consumes rows
  * straight off the stream's executors. The per-row `copy()` is required
  * because the scan reuses UnsafeRow buffers across rows while the
  * consumer may buffer (sort in a partitioned write). */
object MicroBatch {

  /** Rebind a sink-delivered micro-batch as a plain batch DataFrame that
    * executes the SAME physical plan (no driver materialization). */
  def rebind(data: Dataset[Row]): DataFrame = {
    val classic = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    classic.sparkSession.internalCreateDataFrame(rdd, classic.schema,
      isStreaming = false)
  }
}
