package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Classify

/** Streaming incremental classifier fit + inference — the online twin of
  * the Classify family (q121/q122): labeled documents arrive in
  * micro-batches; each batch (1) contributes its Naive-Bayes sufficient
  * statistics, and (2) is scored with the model fit on EVERYTHING seen so
  * far, including itself.
  *
  * Why this is exact rather than approximate: multinomial-NB sufficient
  * statistics are plain integer counts — (lang, token, n) and
  * (lang, n_docs) — which form a commutative monoid under addition. The
  * model at any point is a pure function of the SUM of per-batch stats, so
  * summing hive-partitioned per-batch stat files and fitting equals
  * fitting the one-shot union (spec-pinned). No model state is ever
  * mutated; the stats partitions ARE the state.
  *
  * Crash story (the DocsStream recipe): every write is an OVERWRITE into
  * the batch's own `batch_id=N` partition — stats and predictions alike —
  * so a replayed batch converges to the same files. A batch reads only
  * stats partitions with id <= its own, so a half-written later batch
  * can't contaminate an earlier replay.
  *
  * At 100 TB: per-batch stats are vocab x labels-bounded (megabytes), the
  * batch scan dominates, and the scoring join broadcasts the model — the
  * same shape as the batch path. The stats read-back grows with batch
  * COUNT, not corpus size; compact old partitions (sum them into one) on
  * the same mergeability argument when the file count gets long.
  */
object ClassifyStream {

  /** Start the incremental fit+score stream over `docs` (streaming frame
    * with the documents schema). Per batch N: token/doc stats under
    * `statsDir/{tokens,docs}/batch_id=N`, scored predictions under
    * `predsDir/batch_id=N`. */
  def incrementalClassify(spark: SparkSession, docs: DataFrame,
                          statsDir: String, predsDir: String,
                          checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, statsDir, predsDir)
      }
      .start()

  /** One micro-batch: write this batch's stats, then fit on the stats
    * prefix (ids <= this batch) and score this batch. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
                                  batchId: Long, statsDir: String,
                                  predsDir: String): Unit = {
    val b = batch.select(col("doc_id"), col("lang"), col("text"))
    if (!b.isEmpty) {
      // cached: consumed by the stats write AND the scoring join
      val docTok = Classify.docTokenCounts(b).cache()
      try {
        docTok.groupBy(col("lang"), col("token"))
          .agg(sum(col("n_tok")).as("n_ct"))
          .write.mode("overwrite").parquet(s"$statsDir/tokens/batch_id=$batchId")
        b.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .write.mode("overwrite").parquet(s"$statsDir/docs/batch_id=$batchId")
        val ct = readStatsUpTo(spark, s"$statsDir/tokens", batchId,
          Seq("lang", "token", "n_ct"))
          .groupBy(col("lang"), col("token")).agg(sum(col("n_ct")).as("n_ct"))
        val nd = readStatsUpTo(spark, s"$statsDir/docs", batchId,
          Seq("lang", "n_docs"))
          .groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))
        Classify.nbApply(Classify.nbModelFromCounts(ct),
            Classify.nbPriorsFromCounts(nd), docTok)
          .write.mode("overwrite").parquet(s"$predsDir/batch_id=$batchId")
      } finally docTok.unpersist()
    }
  }

  /** Stats partitions with batch id <= `batchId` (a replayed batch must
    * not read a later batch's files). */
  private def readStatsUpTo(spark: SparkSession, dir: String, batchId: Long,
                            cols: Seq[String]): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch_id="))
      .filter(_.getName.stripPrefix("batch_id=").toLong <= batchId)
      .map(_.toString)
    spark.read.parquet(dirs.toIndexedSeq: _*).select(cols.map(col): _*)
  }

  /** All predictions emitted so far (union of per-batch partitions). */
  def emittedPreds(spark: SparkSession, predsDir: String): DataFrame =
    spark.read.parquet(s"$predsDir/batch_id=*")
}
