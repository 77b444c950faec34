package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.GramAggregator

/** Streaming incremental embedding statistics — the composition of the
  * engine's streaming and moment pillars: embedding vectors arrive in
  * micro-batches, each batch folds into a ~2 KB Gram sketch, and the
  * corpus-wide moments (count, mean, covariance — everything q115/q116/
  * q120 derive) stay current WITHOUT ever rescanning history.
  *
  * Why this is the right 100 TB shape: the per-batch state is one
  * (n, buffer) row — d(d+1)/2 + d exact integer sums — and
  * GramAggregator's merge is elementwise addition, so
  * moments(union of batches) == merge(per-batch sketches) EXACTLY
  * (EmbeddingStatsSpec pins the algebra; EmbsStreamSpec pins this
  * plumbing). Updating statistics over a continuously-ingested corpus
  * costs one scan of the NEW data only; the history contributes one tiny
  * sketch row per batch, never its vectors.
  *
  * State layout mirrors DocsStream: per-batch OVERWRITE into the batch's
  * own `batch_id=N` partition, so a foreachBatch replay after a crash is
  * idempotent (the standard exactly-once recipe for file sinks keyed by
  * batch id).
  */
object EmbsStream {

  private val Dim = 64

  private def sketch(batch: DataFrame): DataFrame = {
    val gram = udaf(new GramAggregator(Dim), ExpressionEncoder[Array[Long]]())
    val quantized = transform(col("embedding"),
      x => floor(x.cast("double") * lit(1048576.0)).cast("long"))
    batch.agg(count(lit(1)).cast("long").as("n"), gram(quantized).as("m"))
  }

  /** Start the streaming moment maintenance: embs (a streaming frame with
    * the embeddings schema) → one sketch row per batch under
    * `momentsDir/batch_id=N`. */
  def momentsStream(spark: SparkSession, embs: DataFrame,
                    momentsDir: String, checkpointDir: String): StreamingQuery =
    embs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, momentsDir)
      }
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  momentsDir: String): Unit = {
    if (!batch.isEmpty) {
      sketch(batch).write.mode("overwrite").parquet(s"$momentsDir/batch_id=$batchId")
    }
  }

  /** The corpus-wide moments so far: merge the per-batch sketches.
    * Bounded driver work — one ~2 KB row per batch ever written (the
    * same class as the IVF centroid collect), elementwise-summed via the
    * aggregator's own merge. */
  def currentMoments(spark: SparkSession, momentsDir: String): (Long, Array[Long]) = {
    val agg = new GramAggregator(Dim)
    val rows = spark.read.parquet(s"$momentsDir/batch_id=*")
      .select(col("n"), col("m")).collect()
    val n = rows.map(_.getLong(0)).sum
    val merged = rows.map(_.getSeq[Long](1).toArray).foldLeft(agg.zero)(agg.merge)
    (n, merged)
  }
}
