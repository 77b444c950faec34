package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup
import graft.streaming.DocsStream

/** Streaming incremental dedup contract: id-ordered micro-batches emit
  * exactly the pairs touching each batch, the union over batches equals
  * the one-shot batch dedup, and a replayed batch is idempotent. */
class DocsStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("docs-stream-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("streamed per-batch emissions union to the one-shot batch dedup") {
    val root = Files.createTempDirectory("graft-docs-stream").toFile.getAbsolutePath
    val (input, hist, pairs, cp) =
      (s"$root/in", s"$root/hist", s"$root/pairs", s"$root/cp")

    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong

    // two id-ordered arrivals: the daily-batch pattern (new ids > history)
    docs.filter(col("doc_id") <= cut).write.parquet(input)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(input)
      val q = DocsStream.dedupPairsStream(spark, stream, hist, pairs, cp)
      q.awaitTermination()
    }
    runOnce()
    docs.filter(col("doc_id") > cut).write.mode("append").parquet(input)
    runOnce()

    val got = DocsStream.emittedPairs(spark, pairs)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val want = Dedup.jaccardPairs(docs)
    assert(asSet(got) == asSet(want),
      "union of per-batch emissions must equal one-shot corpus dedup")
    assert(got.count() > 0 && got.count() == got.distinct().count(),
      "each pair emitted exactly once across batches")

    // replaying a batch (crash-recovery shape) is idempotent: per-batch
    // overwrite partitions leave the global result unchanged
    val batch2 = docs.filter(col("doc_id") > cut)
    DocsStream.processBatch(spark, batch2, batchId = 1L, hist, pairs, 0.8)
    val replayed = DocsStream.emittedPairs(spark, pairs)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    assert(asSet(replayed) == asSet(want), "batch replay must be idempotent")
  }
}
