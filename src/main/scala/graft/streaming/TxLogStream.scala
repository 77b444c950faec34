package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.etl.TxLog

/** Structured-Streaming ingest INTO the TxLog table format — the
  * streaming half of the lakehouse story: micro-batches land as ACID
  * commits, exactly once.
  *
  * Exactly-once contract: Spark's checkpoint guarantees each batch id is
  * REPROCESSED at least once after a crash, never skipped — so the sink
  * must make re-commits of the same batch no-ops. Each batch commits via
  * [[TxLog.appendOnce]] with marker `"<appId>/<batchId>"`: a replay whose
  * commit already published finds its own marker and does nothing (the
  * Delta-protocol appId/version txn pattern). Readers see each batch's
  * rows exactly once regardless of where the writer crashed.
  *
  * Scale shape: the data write is an ordinary distributed parquet write
  * (executors never touch the log); the driver publishes one version
  * file per micro-batch. At 100 TB the same structure holds — commit
  * frequency, not data volume, bounds the log, and checkpoint compaction
  * (TxLog scaladoc) caps replay cost. */
object TxLogStream {

  /** One-shot (AvailableNow) ingest of `stream` into `table`; blocks
    * until drained. `appId` scopes idempotence markers so independent
    * pipelines writing one table cannot collide. */
  def ingest(spark: SparkSession, stream: DataFrame, table: String,
             checkpoint: String, appId: String = "graft-ingest"): Unit =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(spark, batch, table, appId, id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

  /** One micro-batch commit — public so crash-replay is spec-testable
    * without faking a checkpoint rollback. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
                                  table: String, appId: String,
                                  batchId: Long): Unit = {
    TxLog.appendOnce(spark, table, batch, s"$appId/$batchId")
    ()
  }
}
