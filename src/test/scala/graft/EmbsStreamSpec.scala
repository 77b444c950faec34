package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.functions.GramAggregator
import graft.streaming.EmbsStream

/** Streaming incremental moment contract: sketches accumulated over
  * micro-batches merge to EXACTLY the one-shot whole-corpus moments, and
  * a replayed batch is idempotent. */
class EmbsStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("embs-stream-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("streamed sketches merge to the one-shot corpus moments; replay idempotent") {
    val root = Files.createTempDirectory("graft-embs-stream").toFile.getAbsolutePath
    val (input, moments, cp) = (s"$root/in", s"$root/moments", s"$root/cp")

    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
    val cut = embs.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong

    embs.filter(col("vec_id") <= cut).write.parquet(input)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(embs.schema).parquet(input)
      EmbsStream.momentsStream(spark, stream, moments, cp).awaitTermination()
    }
    runOnce()
    embs.filter(col("vec_id") > cut).write.mode("append").parquet(input)
    runOnce()

    // one-shot reference over the full corpus (driver-side exact sums)
    val agg = new GramAggregator(64)
    val whole = embs.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.floor(x.toDouble * 1048576.0).toLong))
      .foldLeft(agg.zero)(agg.reduce)
    val nWhole = embs.count()

    val (n, merged) = EmbsStream.currentMoments(spark, moments)
    assert(n == nWhole)
    assert(merged.toSeq == whole.toSeq,
      "merged per-batch sketches must equal one-shot moments bit-for-bit")

    // crash-recovery replay: re-processing a batch overwrites its own
    // partition, leaving the merged state unchanged
    EmbsStream.processBatch(embs.filter(col("vec_id") > cut), batchId = 1L, moments)
    val (n2, merged2) = EmbsStream.currentMoments(spark, moments)
    assert(n2 == nWhole && merged2.toSeq == whole.toSeq,
      "batch replay must be idempotent")
  }
}
