package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{CmsAggregator, KmvAggregator, Sketches, TextFunctions}
import graft.operators.Datasets

/** Streaming incremental sketch maintenance — the online twin of the
  * profiling sketches (q110 KMV, q129 CMS, q149 HLL): documents arrive in
  * micro-batches; each batch contributes ONE row of sketch state (its KMV
  * token sample, its CMS counter grid, and its HLL bucket-max array), and
  * the corpus-level sketch at any point is the pure MERGE of the
  * per-batch rows.
  *
  * Why this is exact rather than approximate-on-top-of-approximate: the
  * sketches are commutative monoids — the CMS grid under elementwise add,
  * the KMV sketch under k-smallest-distinct union, the HLL array under
  * elementwise max — so merging per-batch
  * sketches equals sketching the union (spec-pinned against the one-shot
  * aggregators). This is the property that makes the sketches USEFUL at
  * 100 TB: a day's corpus profile is a ~32 KB row per batch, the all-time
  * profile is a fold over rows, and nothing ever rescans history.
  *
  * Crash story (the DocsStream recipe): each batch OVERWRITES its own
  * `batch_id=N` partition, so replay converges to the same file.
  */
object SketchStream {

  /** Start the sketch stream over `docs` (streaming frame with the
    * documents schema): per batch N one row (kmv, cms) under
    * `sketchDir/batch_id=N`. */
  def sketchStream(spark: SparkSession, docs: DataFrame, sketchDir: String,
                   checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, sketchDir)
      }
      .start()

  /** One micro-batch: one aggregate pass over the batch, one 1-row write.
    * KMV is over distinct TOKEN hashes (vocabulary cardinality), CMS over
    * token occurrences (frequency) — the same keys as q110/q129. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  sketchDir: String): Unit = {
    val b = batch.select(col("text"))
    if (!b.isEmpty) {
      batchSketch(b)
        .write.mode("overwrite").parquet(s"$sketchDir/batch_id=$batchId")
    }
  }

  /** The (kmv, cms, hll) sketch row for one frame. All three are
    * commutative monoids over token hashes: KMV under k-smallest-distinct
    * union, CMS under elementwise add, HLL under elementwise bucket-max
    * (the q149 geometry — 2^p buckets of max leading-zero rank, dense so
    * the merge is positional). */
  private[graft] def batchSketch(frame: DataFrame): DataFrame = {
    val kmv = udaf(new KmvAggregator(Datasets.KmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    val cms = udaf(new CmsAggregator(Datasets.CmsDepth, Datasets.CmsWidth),
      org.apache.spark.sql.Encoders.scalaLong)
    val toks = frame.select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val kmvCms = toks
      .select(TextFunctions.h60(col("token")).as("h"),
        Datasets.cmsPackedBuckets(col("token"),
          Datasets.CmsDepth, Datasets.CmsWidth).as("pb"))
      .agg(kmv(col("h")).as("kmv"), cms(col("pb")).as("cms"))
    kmvCms.crossJoin(hllRow(toks))
  }

  /** Dense 2^HllP-entry bucket-max array for one frame's tokens (empty
    * buckets 0) — two bounded aggregates, positional-mergeable. */
  private def hllRow(toks: DataFrame): DataFrame = {
    val m = 1 << Datasets.HllP
    val (bucket, rho) = Datasets.hllBucketRho(TextFunctions.h60(col("token")))
    toks.select(bucket.cast("int").as("bucket"), rho.cast("long").as("r"))
      .groupBy(col("bucket")).agg(max(col("r")).as("mr"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("mr")))).as("bm"))
      .select(Sketches.hllDense(col("bm"), m).as("hll"))
  }

  /** Merged corpus sketch from the accumulated per-batch rows, through the
    * shared monoid algebra ([[graft.functions.Sketches]]): KMV = the k
    * smallest distinct hashes across batches, CMS = elementwise counter
    * sum, HLL = elementwise bucket max. One aggregate over the per-batch
    * rows — the batch count is the row count here, so the collected state
    * is tiny at any corpus size (bounded sketch rows, never corpus data;
    * the Sketches scaladoc carries the argument). */
  def mergedSketch(spark: SparkSession, sketchDir: String): DataFrame = {
    // processBatch skips empty batches, so a stream that produced ONLY
    // empty batches (or none yet) leaves no batch_id=* directories — the
    // glob read would throw AnalysisException. The merge of zero sketch
    // rows is the monoid identity: empty KMV sample, all-zero CMS grid.
    val base = new org.apache.hadoop.fs.Path(sketchDir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val hasBatches = fs.exists(base) && fs.listStatus(base)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    if (!hasBatches)
      return spark.range(1).select(
        expr("CAST(array() AS ARRAY<BIGINT>)").as("kmv"),
        array_repeat(lit(0L), Datasets.CmsDepth * Datasets.CmsWidth).as("cms"),
        array_repeat(lit(0L), 1 << Datasets.HllP).as("hll"))
    spark.read.parquet(s"$sketchDir/batch_id=*").agg(
      Sketches.kmvMergeRows(col("kmv"), Datasets.KmvK).as("kmv"),
      Sketches.cmsMergeRows(col("cms"), Datasets.CmsDepth * Datasets.CmsWidth).as("cms"),
      Sketches.hllMergeRows(col("hll"), 1 << Datasets.HllP).as("hll"))
  }
}
