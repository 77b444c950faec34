package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog
import graft.streaming.TxLogStream

/** Streaming CDC-apply (round 13): micro-batches of keyed
  * upserts/deletes land as MERGE / keyed-DELETE commits; crash replay of
  * any prefix converges to the same content (marker-skip for completed
  * batches, idempotent ops inside the crash window). */
class TxLogCdcApplySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("cdc-apply-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def rows(t: String): Seq[(Long, String)] =
    TxLog.read(spark, t).select(col("id"), col("s")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("applyCdc drains a stream of upserts+deletes into the table") {
    import spark.implicits._
    val t = tmp("graft-cdcapply")
    TxLog.append(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    // CDC feed: replace id=1, delete id=2, insert id=9
    val input = Files.createTempDirectory("graft-cdc-in").toString
    val feed = Seq((1L, "a2", "U"), (2L, "b", "D"), (9L, "n", "I"))
      .toDF("id", "s", "op")
    feed.coalesce(1).write.mode("overwrite").parquet(input)
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    TxLogStream.applyCdc(spark,
      spark.readStream.schema(feed.schema).parquet(input),
      t, Seq("id"), ckpt, opCol = Some("op"))
    assert(rows(t) == Seq((1L, "a2"), (3L, "c"), (9L, "n")))
  }

  test("crash replay of an applied batch converges, marker-skip on completion") {
    import spark.implicits._
    val t = tmp("graft-cdcreplay")
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val batch = Seq((1L, "a2", "U"), (2L, "b", "D"), (5L, "e", "I"))
      .toDF("id", "s", "op")
    TxLogStream.applyBatch(spark, batch, t, Seq("id"), Some("op"),
      "app", 7L)
    val after = rows(t)
    val versionsAfter = TxLog.versions(t).size
    assert(after == Seq((1L, "a2"), (5L, "e")))
    // completed-batch replay: marker seen, NOTHING re-runs (no new version)
    TxLogStream.applyBatch(spark, batch, t, Seq("id"), Some("op"),
      "app", 7L)
    assert(TxLog.versions(t).size == versionsAfter)
    assert(rows(t) == after)
    // crash INSIDE the batch window: ops ran but the marker never
    // published — simulate by re-applying under a DIFFERENT batch id
    // (as if the checkpoint rolled back): content must converge
    TxLogStream.applyBatch(spark, batch, t, Seq("id"), Some("op"),
      "app", 8L)
    assert(rows(t) == after)
  }

  test("op-less applyBatch is a plain keyed upsert; empty batch no-ops") {
    import spark.implicits._
    val t = tmp("graft-cdcplain")
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLogStream.applyBatch(spark,
      Seq((1L, "a9"), (2L, "b")).toDF("id", "s"), t, Seq("id"), None, "p", 0L)
    assert(rows(t) == Seq((1L, "a9"), (2L, "b")))
    val n = TxLog.versions(t).size
    TxLogStream.applyBatch(spark,
      Seq.empty[(Long, String)].toDF("id", "s"), t, Seq("id"), None, "p", 1L)
    // an empty batch publishes only its marker
    assert(TxLog.versions(t).size == n + 1)
    assert(rows(t) == Seq((1L, "a9"), (2L, "b")))
  }
}
