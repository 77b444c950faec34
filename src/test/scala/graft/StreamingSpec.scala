package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{GraftSession, Tables}
import graft.operators.{Multimodal, Relational}
import graft.streaming.EventsStream

/** Streaming/batch parity + multimodal plumbing at sf0.001. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("stream-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("streaming windowed counts (AvailableNow) == batch q15 aggregation") {
    val stream = EventsStream.windowedCounts(EventsStream.readStream(spark, sf))
    // complete mode: append would hold back windows newer than the final
    // watermark, which a finite replay never advances past
    val got = EventsStream.runToBatch(spark, stream, "win_counts", outputMode = "complete")
    val want = Relational.q15EventWindows(spark, sf)
    assert(asSet(got) == asSet(want))
    assert(got.count() > 0)
  }

  test("streaming session_window (AvailableNow) == batch sessionization") {
    val stream = EventsStream.sessionWindows(
      EventsStream.readStream(spark, sf).withWatermark("ts", "1 hour"))
    val got = EventsStream.runToBatch(spark, stream, "sessions", outputMode = "complete")
    val want = EventsStream.sessionWindows(Tables.events(spark, sf))
    assert(asSet(got) == asSet(want))
  }

  test("session_window == lag/cumsum SQL twin == typed flatMapGroups state machine") {
    val ev = Tables.events(spark, sf)
    val viaWindow = EventsStream.sessionWindows(ev)
    val viaSql = EventsStream.sessionizeSql(ev)
    val viaTyped = EventsStream.sessionizeTyped(spark, ev).toDF()
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
    assert(asSet(viaWindow) == asSet(viaSql))
    assert(asSet(viaSql) == asSet(viaTyped))
    assert(viaSql.count() > 0)
  }

  test("stream-stream interval join (AvailableNow) == batch join") {
    val s1 = EventsStream.readStream(spark, sf)
    val s2 = EventsStream.readStream(spark, sf)
    val got = EventsStream.runToBatch(spark,
      EventsStream.viewToPurchaseJoin(s1, s2), "vp_join")
    val ev = Tables.events(spark, sf)
    val want = EventsStream.viewToPurchaseJoin(ev, ev)
    assert(asSet(got) == asSet(want))
    assert(got.count() > 0)
  }

  test("stream-stream LEFT OUTER interval join: matched rows == batch; outer rows only when provably unmatched") {
    val s1 = EventsStream.readStream(spark, sf)
    val s2 = EventsStream.readStream(spark, sf)
    val got = EventsStream.runToBatch(spark,
      EventsStream.viewToPurchaseJoinOuter(s1, s2), "vp_outer_join")
    val ev = Tables.events(spark, sf)
    val batch = EventsStream.viewToPurchaseJoinOuter(ev, ev)
    // matched rows are identical to the batch left join's matched rows
    assert(asSet(got.filter(col("view_ts").isNotNull)) ==
      asSet(batch.filter(col("view_ts").isNotNull)))
    // every streamed outer (null-view) row is a batch outer row...
    val gotOuter = asSet(got.filter(col("view_ts").isNull))
    val batchOuter = asSet(batch.filter(col("view_ts").isNull))
    assert(gotOuter.subsetOf(batchOuter),
      s"phantom outer rows: ${gotOuter.diff(batchOuter).take(3)}")
    // ...and outer rows whose retention horizon (2h watermark delay + 1h
    // interval + slack) closed before end-of-stream all emitted
    val maxTs = ev.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - (2 + 1 + 1) * 3600 * 1000L)
    val mustEmit = asSet(batch.filter(col("view_ts").isNull && col("purchase_ts") < lit(horizon)))
    assert(mustEmit.subsetOf(gotOuter),
      s"missing settled outer rows: ${mustEmit.diff(gotOuter).take(3)}")
    assert(gotOuter.nonEmpty && mustEmit.nonEmpty)
  }

  test("streaming flatMapGroupsWithState sessionize emits exact batch sessions") {
    val stream = EventsStream.sessionizeStream(spark, EventsStream.readStream(spark, sf)).toDF()
    val got = EventsStream.runToBatch(spark, stream, "state_sessions")
    val batch = EventsStream.sessionizeSql(Tables.events(spark, sf))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    val gotSet = asSet(got.select("user_id", "session_start", "session_end", "n_events", "sum_value"))
    val batchSet = asSet(batch)
    // every emitted session is byte-identical to a batch session
    assert(gotSet.subsetOf(batchSet), s"phantom sessions: ${gotSet.diff(batchSet).take(3)}")
    // sessions that closed well before the final watermark horizon all emitted
    val maxTs = Tables.events(spark, sf).agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - (10 + 30 + 1) * 60 * 1000)
    val mustEmit = asSet(batch.filter(col("session_end") < lit(horizon)))
    assert(mustEmit.subsetOf(gotSet),
      s"missing closed sessions: ${mustEmit.diff(gotSet).take(3)}")
    assert(gotSet.nonEmpty)
  }

  test("event-time timeout closes a silent user's session once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime + min * 60000L)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event]
    val out = EventsStream.sessionizeStream(spark, ms.toDF()).toDF()
    val q = out.writeStream.format("memory").queryName("timeout_sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has a two-event session [00:00, 00:01], then goes
      // silent forever
      ms.addData(EventsStream.Event(1L, t(0), 1L, 1.0),
        EventsStream.Event(2L, t(1), 1L, 2.0))
      q.processAllAvailable()
      // batch 2: only user 2, far in the future — advances the watermark
      // (60min - 10min delay = 00:50) past user 1's timeout (00:01 + 30min)
      ms.addData(EventsStream.Event(3L, t(60), 2L, 1.0))
      q.processAllAvailable()
      // batch 3: the timeout fires against the batch-2 watermark
      ms.addData(EventsStream.Event(4L, t(61), 2L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("timeout_sessions")
        .filter(col("user_id") === 1L).collect()
      assert(rows.length == 1, s"expected exactly one timed-out session, got ${rows.toSeq}")
      val r = rows.head
      assert(r.getAs[java.sql.Timestamp]("session_start") == t(0))
      assert(r.getAs[java.sql.Timestamp]("session_end") == t(1))
      assert(r.getAs[Long]("n_events") == 2L)
      assert(r.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming dropDuplicatesWithinWatermark == batch distinct keys") {
    // which physical row survives streaming dedup is arrival-order-dependent;
    // the deterministic (and useful) contract is the deduplicated KEY set —
    // state is evictable once the watermark passes, unlike plain
    // dropDuplicates whose state grows unboundedly on a stream
    val stream = EventsStream.readStream(spark, sf)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val got = EventsStream.runToBatch(spark, stream, "dedup_keys")
    val want = Tables.events(spark, sf).select(col("user_id"), col("event_type")).distinct()
    assert(asSet(got) == asSet(want))
    assert(got.count() > 0)
  }

  test("stream-static enrichment join (AvailableNow) == batch join") {
    import spark.implicits._
    val dim = Seq(("view", "engagement"), ("purchase", "revenue"),
      ("signup", "growth")).toDF("event_type", "category")
    val got = EventsStream.runToBatch(spark,
      EventsStream.enrichWithTypes(EventsStream.readStream(spark, sf), dim), "enriched")
    val want = EventsStream.enrichWithTypes(Tables.events(spark, sf), dim)
    assert(asSet(got) == asSet(want))
    assert(got.filter(col("category").isNull).count() ==
      Tables.events(spark, sf)
        .filter(!col("event_type").isin("view", "purchase", "signup")).count())
  }

  test("foreachBatch incremental rollup state == batch aggregate (exact decimal)") {
    val got = EventsStream.maintainRollup(spark, EventsStream.readStream(spark, sf))
    val want = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
    assert(asSet(got) == asSet(want))
    assert(got.count() > 0)
  }

  test("multimodal: feature extraction batches per partition with typed schema") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf))
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media).cache()
    assert(feats.count() == media.count())
    val f = feats.filter(col("doc_id") === 0).collect().head
    assert(f.feature.length == 4)
    assert(f.n_bytes > 0 && f.width == f.n_bytes % 640)
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, media)
      .filter(col("doc_id") === 0).collect().head
    assert(f.feature.sameElements(again.feature))
  }

  test("multimodal: frame sampling explodes deterministically") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaTable(Tables.documents(spark, sf)))
    val perDoc = frames.groupBy("doc_id").count()
    assert(frames.filter(col("byte_offset") % 100 =!= 0).count() == 0)
    assert(perDoc.filter(col("count") < 1).count() == 0)
  }
}
