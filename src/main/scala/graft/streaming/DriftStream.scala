package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distribution-drift monitor — the online twin of q170's
  * Kolmogorov–Smirnov drift screen: documents arrive in micro-batches;
  * each batch contributes its log₂ length histogram (≤ 64 integer
  * counters, the q166/q169 binning), and the STREAM's cumulative length
  * distribution at any point is the pure elementwise SUM of the per-batch
  * rows — so the "has the incoming data drifted from the reference
  * corpus" KS statistic is computable after every batch without ever
  * rescanning history.
  *
  * Why this is exact: histograms are commutative monoids under addition
  * (merge-of-batches == histogram-of-union, spec-pinned), and the KS
  * distance over the bucket grid is evaluated with integer
  * cross-multiplication — D = max |cum_s·n_r − cum_r·n_s| / (n_s·n_r),
  * numerator exact BIGINT, one terminal division — so a monitoring
  * alert never depends on float summation order across batches.
  *
  * Bucketed KS is the GRID version of q170's per-value statistic: at
  * 100 TB the per-value ECDF support is unbounded while this state is 64
  * counters per batch, the trade every production drift monitor
  * (EvidentlyAI-style PSI/KS dashboards) makes.
  *
  * Crash story (the DocsStream recipe): each batch OVERWRITES its own
  * `batch_id=N` partition, so replay converges to the same files.
  */
object DriftStream {

  /** log₂ bucket of n_chars — identical binning to q169's histogram
    * (length of the binary rendering − 1; n_chars ≥ 1 by schema). */
  private def bucketOf(n: org.apache.spark.sql.Column) =
    (length(bin(n)) - lit(1)).cast("long")

  /** Start the drift stream over `docs` (streaming frame with the
    * documents schema): per batch N, ≤64 (bucket, c) rows under
    * `histDir/batch_id=N`. */
  def driftStream(spark: SparkSession, docs: DataFrame, histDir: String,
                  checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, histDir)
      }
      .start()

  /** One micro-batch: one bounded aggregate, one ≤64-row write. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  histDir: String): Unit = {
    if (!batch.isEmpty) {
      batchHistogram(batch)
        .write.mode("overwrite").parquet(s"$histDir/batch_id=$batchId")
    }
  }

  /** The (bucket, c) histogram rows for one frame. */
  private[graft] def batchHistogram(frame: DataFrame): DataFrame =
    frame.select(bucketOf(col("n_chars")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** Cumulative stream histogram: elementwise sum over all batch rows. */
  def mergedHistogram(spark: SparkSession, histDir: String): DataFrame =
    spark.read.parquet(s"$histDir/batch_id=*")
      .groupBy(col("bucket")).agg(sum(col("c")).as("c"))

  /** Two-sample KS statistic of the stream histogram against a reference
    * histogram (same (bucket, c) shape, e.g. [[batchHistogram]] of the
    * frozen reference corpus): one row
    * (n_stream, n_ref, d_num, ks) with d_num = max |cum_s·n_r − cum_r·n_s|
    * exact and ks = d_num/(n_s·n_r) the only double. */
  def ksAgainst(stream: DataFrame, reference: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = stream.select(col("bucket"), col("c").as("cs"))
      .join(reference.select(col("bucket"), col("c").as("cr")), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cs"), lit(0L)).as("cs"), coalesce(col("cr"), lit(0L)).as("cr"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = joined
      .withColumn("cums", sum(col("cs")).over(w))
      .withColumn("cumr", sum(col("cr")).over(w))
    val tot = cum.agg(max(col("cums")).as("n_stream"), max(col("cumr")).as("n_ref"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_stream"), col("n_ref"),
        abs(col("cums") * col("n_ref") - col("cumr") * col("n_stream")).as("num"))
      .groupBy(col("n_stream"), col("n_ref"))
      .agg(max(col("num")).as("d_num"))
      .select(col("n_stream"), col("n_ref"), col("d_num"),
        (col("d_num").cast("double") /
          (col("n_stream").cast("double") * col("n_ref").cast("double"))).as("ks"))
  }
}
