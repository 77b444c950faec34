package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.streaming.SketchStream

/** Streaming sketch-maintenance contract: the merge of per-batch KMV/CMS
  * rows equals the one-shot sketch over the full corpus (monoid
  * mergeability), and batch replay is idempotent. */
class SketchStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("sketch-stream-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("merged per-batch sketches == one-shot sketch; replay idempotent") {
    val root = Files.createTempDirectory("graft-sketch-stream").toFile.getAbsolutePath
    val (input, sketches, cp) = (s"$root/in", s"$root/sk", s"$root/cp")

    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong

    docs.filter(col("doc_id") <= cut).write.parquet(input)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(input)
      SketchStream.sketchStream(spark, stream, sketches, cp).awaitTermination()
    }
    runOnce()
    docs.filter(col("doc_id") > cut).write.mode("append").parquet(input)
    runOnce()

    assert(spark.read.parquet(s"$sketches/batch_id=*").count() == 2,
      "two micro-batches, one sketch row each")

    val merged = SketchStream.mergedSketch(spark, sketches).head()
    val oneShot = SketchStream.batchSketch(docs).head()
    assert(merged.getSeq[Long](merged.fieldIndex("kmv")) ==
      oneShot.getSeq[Long](oneShot.fieldIndex("kmv")),
      "KMV union-of-batches must equal the one-shot k-smallest set")
    assert(merged.getSeq[Long](merged.fieldIndex("cms")) ==
      oneShot.getSeq[Long](oneShot.fieldIndex("cms")),
      "CMS grid sum-of-batches must equal the one-shot grid")
    assert(merged.getSeq[Long](merged.fieldIndex("hll")) ==
      oneShot.getSeq[Long](oneShot.fieldIndex("hll")),
      "HLL bucket max-of-batches must equal the one-shot bucket maxima")
    assert(merged.getSeq[Long](merged.fieldIndex("hll")).exists(_ > 0L),
      "fixture corpus must touch at least one bucket")

    // replaying the last batch (crash recovery) changes nothing
    SketchStream.processBatch(docs.filter(col("doc_id") > cut), 1L, sketches)
    val replayed = SketchStream.mergedSketch(spark, sketches).head()
    assert(replayed.getSeq[Long](replayed.fieldIndex("cms")) ==
      oneShot.getSeq[Long](oneShot.fieldIndex("cms")),
      "batch replay must be idempotent")
  }

  test("mergedSketch of a stream with no written batches is the monoid identity") {
    // processBatch skips empty batches — a stream of only-empty batches
    // leaves NO batch_id=* dirs; the merge must be the identity sketch,
    // not an AnalysisException
    val empty = Files.createTempDirectory("graft-sketch-none").toFile.getAbsolutePath
    for (dir <- Seq(empty, s"$empty/made-but-batchless")) {
      if (dir.endsWith("batchless")) new java.io.File(dir).mkdirs()
      val row = SketchStream.mergedSketch(spark, dir).head()
      assert(row.getSeq[Long](row.fieldIndex("kmv")).isEmpty, "empty KMV sample")
      val cms = row.getSeq[Long](row.fieldIndex("cms"))
      assert(cms.length == graft.operators.Datasets.CmsDepth * graft.operators.Datasets.CmsWidth
        && cms.forall(_ == 0L), "all-zero CMS grid")
      val hll = row.getSeq[Long](row.fieldIndex("hll"))
      assert(hll.length == (1 << graft.operators.Datasets.HllP)
        && hll.forall(_ == 0L), "all-zero HLL buckets")
    }
  }
}
