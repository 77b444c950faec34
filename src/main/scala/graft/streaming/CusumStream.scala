package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CUSUM mean-shift monitor — the online twin of q223's batch
  * changepoint: documents arrive in micro-batches; each batch contributes
  * ONE (n, Σ n_chars) row, and the classic one-sided CUSUM statistics
  *
  *   S⁺_t = max(0, S⁺_{t−1} + (x̄_t − μ₀ − k)·n_t)
  *   S⁻_t = max(0, S⁻_{t−1} + (μ₀ − k − x̄_t)·n_t)
  *
  * are evaluated over the batch sequence WITHOUT the sequential
  * recursion: on the prefix sums P_t = Σ_{j≤t} dev_j the identity
  * S_t = P_t − min(0, min_{j≤t} P_j) holds exactly, so the trajectory is
  * two cumulative windows over the |batches| frame — distributable,
  * replayable, and independent of evaluation order.
  *
  * Exactness: per-batch deviations enter on a 1e6 fixed-point grid
  * (floor of one pinned double product — batch count and length sum are
  * exact integers), so prefix sums and running minima are pure long
  * arithmetic; only the reported S values divide back to doubles. The
  * monitor state is ONE row per micro-batch regardless of batch size —
  * the 100 TB trade, same as DriftStream's 64 counters.
  *
  * Crash story (the DocsStream recipe): each batch OVERWRITES its own
  * `batch_id=N` partition, so replay converges to the same files.
  */
object CusumStream {

  /** Default slack (k, in chars) and alarm threshold (h, in char·obs
    * units of the drift sum): alarm when the cumulated excess mean
    * drift exceeds h. */
  val DefaultSlack = 5.0
  val DefaultH = 500.0

  /** Start the monitor over `docs` (streaming frame with the documents
    * schema): per batch N, one (n, s) row under `statsDir/batch_id=N`. */
  def cusumStream(spark: SparkSession, docs: DataFrame, statsDir: String,
                  checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statsDir)
      }
      .start()

  /** One micro-batch: one bounded aggregate, one 1-row write. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  statsDir: String): Unit = {
    if (!batch.isEmpty) {
      batchStats(batch)
        .write.mode("overwrite").parquet(s"$statsDir/batch_id=$batchId")
    }
  }

  /** The one-row (n, s) stats for one frame. */
  private[graft] def batchStats(frame: DataFrame): DataFrame =
    frame.agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))

  /** All per-batch stats with the partition-discovered batch_id. */
  def batchSeries(spark: SparkSession, statsDir: String): DataFrame =
    spark.read.parquet(statsDir)
      .select(col("batch_id").cast("long").as("batch_id"), col("n"), col("s"))

  /** CUSUM trajectory over a (batch_id, n, s) frame against reference
    * mean `mu0`: per batch — the batch mean, both one-sided CUSUM
    * statistics, and their alarm flags. */
  def cusumTrajectory(stats: DataFrame, mu0: Double,
                      slack: Double = DefaultSlack,
                      h: Double = DefaultH): DataFrame = {
    val devUp = floor((col("s").cast("double") -
      (lit(mu0) + lit(slack)) * col("n").cast("double")) * lit(1e6)).cast("long")
    val devDn = floor(((lit(mu0) - lit(slack)) * col("n").cast("double") -
      col("s").cast("double")) * lit(1e6)).cast("long")
    val w = Window.orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stats
      .withColumn("pu", sum(devUp).over(w))
      .withColumn("pd", sum(devDn).over(w))
      .withColumn("su", col("pu") - least(min(col("pu")).over(w), lit(0L)))
      .withColumn("sd", col("pd") - least(min(col("pd")).over(w), lit(0L)))
      .select(col("batch_id"), col("n"),
        (col("s").cast("double") / col("n").cast("double")).as("batch_mean"),
        (col("su").cast("double") / lit(1e6)).as("s_plus"),
        (col("sd").cast("double") / lit(1e6)).as("s_minus"),
        (col("su").cast("double") / lit(1e6) > lit(h)).as("alarm_up"),
        (col("sd").cast("double") / lit(1e6) > lit(h)).as("alarm_down"))
      .orderBy(col("batch_id"))
  }
}
