package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming incremental time-decayed activity — the online twin of q184
  * (Evaluation.decayWeighted): events arrive in micro-batches; each batch
  * writes ONE partition of per-user partial state anchored at the BATCH
  * maximum timestamp, and the all-time decayed score is a pure MERGE over
  * batch rows:
  *
  *   total(u) = Σ_batches contrib_b(u) · 2^(−(T* − T_b)/halflife)
  *
  * where T_b is batch b's anchor and T* = max_b T_b. Exponential decay is
  * the exponent-additive property that makes the counter mergeable —
  * re-anchoring a partial sum is one multiply, so history is NEVER
  * rescanned (the classic decaying-counter trick behind feature-store
  * freshness scores at 100 TB: a batch's contribution is |users_in_batch|
  * rows regardless of history size).
  *
  * Crash story (the SketchStream recipe): each batch OVERWRITES its own
  * `batch_id=N` partition, so replay converges to the same files and the
  * merge is idempotent. Merge-vs-one-shot parity is float-associativity
  * bounded (decay re-anchoring reassociates exp products), spec-pinned at
  * 1e-9 relative — unlike the integer sketches this monoid is exact only
  * in ℝ.
  */
object DecayStream {

  /** Same half-life q184 pins: one day. */
  private[graft] val HalfLifeDays = 1.0

  /** Start the decay stream over `events` (streaming frame with the
    * events schema): per batch N one per-user partial under
    * `stateDir/batch_id=N`. */
  def decayStream(spark: SparkSession, events: DataFrame, stateDir: String,
                  checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stateDir)
      }
      .start()

  /** One micro-batch: per-user contributions anchored at the batch max
    * timestamp — one aggregate pass, one partition write. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  stateDir: String): Unit = {
    if (!batch.isEmpty) {
      val anchor = batch.agg(max(unix_micros(col("ts"))).as("anchor_us"))
      val ageDays = (col("anchor_us") - unix_micros(col("ts"))).cast("double") /
        lit(1e6) / lit(86400.0)
      batch.crossJoin(broadcast(anchor))
        .select(col("user_id"), col("anchor_us"),
          (col("value") * graft.functions.Pin.grid9(
              exp(-(ageDays / lit(HalfLifeDays)) * lit(math.log(2.0)))))
            .as("term"))
        .groupBy(col("user_id"), col("anchor_us"))
        .agg(count(lit(1)).as("n_events"), sum(col("term")).as("contrib"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(s"$stateDir/batch_id=$batchId")
    }
  }

  /** Fold the per-batch partials into the all-time per-user score,
    * re-anchored at the global max batch anchor. */
  def mergedDecay(spark: SparkSession, stateDir: String): DataFrame = {
    val batches = spark.read.parquet(s"$stateDir/batch_id=*")
    val star = batches.agg(max(col("anchor_us")).as("star_us"))
    val reanchorDays = (col("star_us") - col("anchor_us")).cast("double") /
      lit(1e6) / lit(86400.0)
    batches.crossJoin(broadcast(star))
      .select(col("user_id"), col("n_events"),
        (col("contrib") * graft.functions.Pin.grid9(
            exp(-(reanchorDays / lit(HalfLifeDays)) * lit(math.log(2.0)))))
          .as("part"))
      .groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("part")).as("decayed_value"))
      .orderBy(col("user_id"))
  }
}
