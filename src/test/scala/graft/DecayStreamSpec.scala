package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Evaluation
import graft.streaming.DecayStream

/** Streaming decayed-activity contract: the re-anchored merge of
  * per-batch partials equals the one-shot q184 batch score (within float
  * associativity), and batch replay is idempotent.
  */
class DecayStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("decay-stream-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("merged per-batch decay == one-shot q184 within 1e-9; replay idempotent") {
    val root = Files.createTempDirectory("graft-decay-stream").toFile.getAbsolutePath
    val (input, state, cp) = (s"$root/in", s"$root/state", s"$root/cp")

    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val cut = ev.agg(expr("percentile(event_id, 0.5)")).head.getDouble(0).toLong

    // two arrival waves, time-ordered (late batch carries the later anchor)
    ev.filter(col("event_id") <= cut).write.parquet(input)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema).parquet(input)
      DecayStream.decayStream(spark, stream, state, cp).awaitTermination()
    }
    runOnce()
    ev.filter(col("event_id") > cut).write.mode("append").parquet(input)
    runOnce()

    assert(spark.read.parquet(s"$state/batch_id=*")
      .select(col("anchor_us")).distinct().count() == 2,
      "two batches, two anchors")

    val merged = DecayStream.mergedDecay(spark, state).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val oneShot = Evaluation.decayWeighted(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // error bound: re-anchoring reassociates exp products, and since the
    // round-11 transcendental sweep each exp factor is grid-pinned at
    // 1e-9 — the merged path quantizes twice (batch term + re-anchor
    // factor) where the one-shot path quantizes once, so the drift is
    // bounded by ~1e-9 x the user's raw value mass, not 1e-9 x decayed
    val rawSum = ev.groupBy(col("user_id"))
      .agg(sum(abs(col("value"))).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(merged.keySet == oneShot.keySet)
    oneShot.foreach { case (u, (n, d)) =>
      assert(merged(u)._1 == n, s"user $u event count")
      val tol = 1e-9 * math.max(1.0, math.abs(d)) + 2e-9 * rawSum(u)
      assert(math.abs(merged(u)._2 - d) <= tol,
        s"user $u decayed: merged=${merged(u)._2} batch=$d tol=$tol")
    }

    // replaying the last batch (crash recovery) converges to the same state
    DecayStream.processBatch(ev.filter(col("event_id") > cut), 1L, state)
    val replayed = DecayStream.mergedDecay(spark, state).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    merged.foreach { case (u, (_, d)) =>
      assert(math.abs(replayed(u) - d) == 0.0, s"user $u replay drift")
    }
  }
}
