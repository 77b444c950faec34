package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Classify
import graft.streaming.ClassifyStream

/** Streaming incremental-classifier contract: summed per-batch sufficient
  * statistics fit the SAME model as the one-shot batch fit (count
  * mergeability), the last batch is scored under the full-corpus model,
  * and batch replay is idempotent. */
class ClassifyStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("classify-stream-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("incremental stats fit == one-shot fit; final batch scored on full model") {
    val root = Files.createTempDirectory("graft-classify-stream").toFile.getAbsolutePath
    val (input, stats, preds, cp) =
      (s"$root/in", s"$root/stats", s"$root/preds", s"$root/cp")

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong

    docs.filter(col("doc_id") <= cut).write.parquet(input)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(input)
      val q = ClassifyStream.incrementalClassify(spark, stream, stats, preds, cp)
      q.awaitTermination()
    }
    runOnce()
    docs.filter(col("doc_id") > cut).write.mode("append").parquet(input)
    runOnce()

    // 1. mergeability: model re-fit from the accumulated stat partitions
    //    equals the one-shot fit over the full corpus, bit for bit
    val ct = spark.read.parquet(s"$stats/tokens/batch_id=*")
      .groupBy(col("lang"), col("token")).agg(sum(col("n_ct")).as("n_ct"))
    val streamed = Classify.nbModelFromCounts(ct)
    val oneShot = Classify.fitModel(docs)
    assert(asSet(streamed) == asSet(oneShot),
      "summed per-batch stats must fit the identical model")

    // 2. the second batch saw batch-1 stats too: its predictions equal the
    //    one-shot full-corpus predictions restricted to its docs
    val batch2Preds = spark.read.parquet(s"$preds/batch_id=*")
      .filter(col("doc_id") > cut)
    val wantB2 = Classify.nbPredictions(docs).filter(col("doc_id") > cut)
    assert(asSet(batch2Preds) == asSet(wantB2),
      "final batch must be scored under the full-corpus model")

    // 3. every doc scored exactly once across batches
    val all = ClassifyStream.emittedPreds(spark, preds)
    assert(all.count() == docs.count())
    assert(all.select(col("doc_id")).distinct().count() == docs.count())

    // 4. replaying the last batch (crash recovery) changes nothing
    ClassifyStream.processBatch(spark, docs.filter(col("doc_id") > cut),
      batchId = 1L, stats, preds)
    assert(asSet(spark.read.parquet(s"$preds/batch_id=*")
      .filter(col("doc_id") > cut)) == asSet(wantB2),
      "batch replay must be idempotent")
  }
}
