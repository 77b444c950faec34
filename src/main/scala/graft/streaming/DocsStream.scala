package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming corpus ingest + incremental near-dup dedup — the composition
  * of the engine's streaming and dedup pillars into the daily-pipeline
  * shape: documents arrive in id-ordered micro-batches (the reference
  * ingests one day at a time — `src/etl/bronze_ingest.py` start_date ==
  * end_date == today — so batch ids always exceed history ids), and each
  * batch emits exactly the near-dup pairs that TOUCH the batch, via the
  * batch-restricted AllPairs posting join (Dedup.jaccardPairsIncremental —
  * cost ∝ batch, history×history never recompared).
  *
  * Invariant (spec-pinned): every pair (a < b) is emitted exactly once, by
  * the batch containing its larger id b — so the union of all per-batch
  * emissions equals the one-shot batch `Dedup.jaccardPairs` over the full
  * corpus.
  *
  * State is the history itself, persisted as hive-partitioned parquet
  * (batch_id=N dirs). Writes are per-batch OVERWRITE into the batch's own
  * partition, so a foreachBatch replay after a crash is idempotent — the
  * standard exactly-once recipe for file sinks keyed by batch id. At
  * 100 TB the history dir is the persisted prefix index the daily batch
  * probes (PLANS.md q101 note); nothing about the plan changes.
  */
object DocsStream {

  /** Start the streaming dedup: docs (a streaming frame with the documents
    * schema) → per-batch pair emissions under `pairsDir/batch_id=N`,
    * history accumulated under `historyDir/batch_id=N`. */
  def dedupPairsStream(spark: SparkSession, docs: DataFrame,
                       historyDir: String, pairsDir: String,
                       checkpointDir: String,
                       threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, historyDir, pairsDir, threshold)
      }
      .start()

  /** One micro-batch: pairs(batch vs history∪batch) → overwrite the
    * batch's own output partition; then append the batch to history (also
    * its own partition → replay-idempotent). */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
                                      batchId: Long, historyDir: String,
                                      pairsDir: String,
                                      threshold: Double): Unit = {
    val b = batch.select(col("doc_id"), col("text"))
    val newMinRow = b.agg(min(col("doc_id"))).head()
    if (!newMinRow.isNullAt(0)) {
      val newMin = newMinRow.getLong(0)
      // history = STRICTLY EARLIER batches: a replayed batch must not see
      // its own partial write from the crashed attempt as history
      val history = readHistoryBefore(spark, historyDir, batchId)
      val corpus = history match {
        case Some(h) => h.unionByName(b)
        case None    => b
      }
      Dedup.jaccardPairsIncremental(corpus, newMin, threshold)
        .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
      b.write.mode("overwrite").parquet(s"$historyDir/batch_id=$batchId")
    }
  }

  private def readHistoryBefore(spark: SparkSession, historyDir: String,
                                batchId: Long): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(historyDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else {
      val dirs = fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith("batch_id="))
        .filter(_.getName.stripPrefix("batch_id=").toLong < batchId)
        .map(_.toString)
      if (dirs.isEmpty) None
      else Some(spark.read.parquet(dirs.toIndexedSeq: _*)
        .select(col("doc_id"), col("text")))
    }
  }

  /** All pairs emitted so far (union of the per-batch partitions). */
  def emittedPairs(spark: SparkSession, pairsDir: String): DataFrame =
    spark.read.parquet(s"$pairsDir/batch_id=*")
}
