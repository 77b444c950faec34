package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.streaming.DriftStream

/** Streaming drift-monitor contract: merged per-batch histograms equal the
  * one-shot histogram (monoid mergeability), replay is idempotent, and the
  * integer-cross-multiplied KS statistic detects a planted length shift
  * while staying ~0 for same-distribution streams. */
class DriftStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("drift-stream-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("merged per-batch histograms == one-shot; replay idempotent") {
    val root = Files.createTempDirectory("graft-drift-stream").toFile.getAbsolutePath
    val (input, hist, cp) = (s"$root/in", s"$root/h", s"$root/cp")

    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong

    docs.filter(col("doc_id") <= cut).write.parquet(input)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(input)
      DriftStream.driftStream(spark, stream, hist, cp).awaitTermination()
    }
    runOnce()
    docs.filter(col("doc_id") > cut).write.mode("append").parquet(input)
    runOnce()

    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = asMap(DriftStream.mergedHistogram(spark, hist))
    val oneShot = asMap(DriftStream.batchHistogram(docs))
    assert(merged == oneShot, "sum of batch histograms must equal one-shot")

    // replaying the last batch (crash recovery) changes nothing
    DriftStream.processBatch(docs.filter(col("doc_id") > cut), 1L, hist)
    assert(asMap(DriftStream.mergedHistogram(spark, hist)) == oneShot)
  }

  test("ks is 0 for identical distributions, large for a planted shift") {
    import spark.implicits._
    val ref = DriftStream.batchHistogram(
      Seq.tabulate(200)(i => (i.toLong, 100L + (i % 50))).toDF("doc_id", "n_chars"))
    val same = DriftStream.ksAgainst(ref, ref).head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
    // shifted stream: lengths 16x larger -> different log2 buckets entirely
    val shifted = DriftStream.batchHistogram(
      Seq.tabulate(200)(i => (i.toLong, 1600L + (i % 50))).toDF("doc_id", "n_chars"))
    val drift = DriftStream.ksAgainst(shifted, ref).head()
    assert(drift.getDouble(3) > 0.9, s"ks=${drift.getDouble(3)}")
    assert(drift.getLong(0) == 200L && drift.getLong(1) == 200L)
  }

  test("ks numerator is the exact integer cross-multiplication") {
    import spark.implicits._
    // stream: 3 docs in bucket 1, 1 in bucket 2; ref: 2 and 2
    val s = Seq((1L, 2L), (2L, 3L), (3L, 3L), (4L, 4L)).toDF("doc_id", "n_chars")
    val r = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_id", "n_chars")
    val row = DriftStream.ksAgainst(
      DriftStream.batchHistogram(s), DriftStream.batchHistogram(r)).head()
    // buckets: 2,3->1; 4,5->2. stream cum: (3,4); ref cum: (2,4)
    // |3*4-2*4| = 4 at bucket 1; |4*4-4*4| = 0 at bucket 2 -> d_num=4, ks=4/16
    assert(row.getLong(2) == 4L)
    assert(math.abs(row.getDouble(3) - 0.25) < 1e-15)
  }
}
