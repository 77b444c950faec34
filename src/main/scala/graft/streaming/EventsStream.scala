package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.core.Tables

/** Structured Streaming over the `events` table (north-star extension;
  * the reference is daily batch only — SURVEY §2.7).
  *
  * Batch/stream parity by construction: every streaming aggregation here has
  * a batch twin built from the same expressions, and the specs assert
  * equality under `Trigger.AvailableNow` (the streaming engine replays the
  * parquet as micro-batches and must converge to the batch answer).
  */
object EventsStream {

  /** Parquet schema of events.parquet with `ts` as read for the given
    * generator vintage (INT64 TIMESTAMP(NANOS) → long under nanosAsLong;
    * timestamp[us] without timezone → TIMESTAMP_NTZ). */
  private def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the events parquet, normalized to a session-UTC
    * TIMESTAMP exactly like `Tables.events` (the streaming source needs an
    * explicit schema, so the footer's ts vintage is probed via one batch
    * schema read — driver-side planning only, no job). */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType
    // two on-disk layouts exist: the driver testdata is a single FILE
    // `events.parquet` (stream the parent dir, glob-filtered to it —
    // FileStreamSource needs a directory), the scale-rehearsal copy is a
    // DIRECTORY `events.parquet/part-*.parquet` (stream it directly)
    val raw =
      if (new java.io.File(s"$dir/events.parquet").isDirectory)
        spark.readStream.schema(rawSchema(tsType)).parquet(s"$dir/events.parquet")
      else spark.readStream.schema(rawSchema(tsType))
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling-window counts with a watermark — the streaming twin of
    * Relational.q15EventWindows. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Run a streaming frame to completion against the finite parquet input
    * (AvailableNow) and return the materialized result. */
  def runToBatch(spark: SparkSession, streamDf: DataFrame, name: String,
                 outputMode: String = "append"): DataFrame = {
    val q = streamDf.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  // ------------------------------------------------------------------ //
  // Sessionization: 30-minute-gap sessions per user.

  val GapMinutes = 30

  /** Batch/stream twin via the built-in session_window (works in both
    * modes; in streaming, watermark closes sessions). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$GapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** The same sessions via lag + cumulative-sum windows — the pure-SQL
    * formulation (this is the DuckDB oracle's shape). */
  def sessionizeSql(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > GapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Custom-state sessionization via KeyValueGroupedDataset.flatMapGroups —
    * the hand-rolled-state surface (in streaming the same body runs under
    * flatMapGroupsWithState with an event-time timeout closing sessions). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  def sessionizeTyped(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = GapMinutes * 60L * 1000000L
    def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events.select(col("event_id"), col("ts"), col("user_id"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
        if (evs.isEmpty) Iterator.empty
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var start = evs.head.ts; var end = evs.head.ts
          var n = 0L; var sum = BigDecimal(0)
          for (e <- evs) {
            val gap = micros(e.ts) - micros(end)
            if (n > 0 && gap > gapMicros) {
              out += Session(uid, start, end, n, sum.toDouble)
              start = e.ts; n = 0; sum = BigDecimal(0)
            }
            end = e.ts; n += 1
            sum += BigDecimal(e.value).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }
          out += Session(uid, start, end, n, sum.toDouble)
          out.iterator
        }
      }
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * view events in the preceding hour. Both sides watermarked; the time
    * bound lets the engine discard state past the interval — the canonical
    * streaming enrichment join. Works identically on batch frames. */
  def viewToPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    p.join(v,
      col("p_user") === col("v_user") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"))
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("purchase_value"), col("view_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: as viewToPurchaseJoin, but a
    * purchase with no qualifying view still emits (null view columns). The
    * engine can emit such a row only once the watermark PROVES no matching
    * view can still arrive — outer results trail the inner ones by the
    * state-retention horizon (watermark delay + join interval). On batch
    * frames this is a plain left join with no horizon; the spec pins the
    * correspondence between the two. */
  def viewToPurchaseJoinOuter(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    p.join(v,
      col("p_user") === col("v_user") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("purchase_value"), col("view_ts"))
  }

  /** Open-session state carried between micro-batches (micros + exact sum). */
  case class SessState(startUs: Long, endUs: Long, n: Long, sum: BigDecimal)

  /** STREAMING custom-state sessionization: flatMapGroupsWithState with an
    * event-time timeout. Sessions closed by a later event emit immediately;
    * trailing open sessions emit when the watermark passes end + gap.
    * Same session boundaries and sums as the batch twins (sessionizeSql /
    * sessionWindows) — the spec checks emitted rows against them. */
  def sessionizeStream(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapUs = GapMinutes * 60L * 1000000L
    def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp((us / 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt); t
    }
    def dec(v: Double): BigDecimal = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def emit(uid: Long, s: SessState): Session =
      Session(uid, tsOf(s.startUs), tsOf(s.endUs), s.n, s.sum.toDouble)

    events.withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            Iterator.single(emit(uid, s))
          } else {
            val evs = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- evs) {
              val m = micros(e.ts)
              cur = cur match {
                case Some(s) if m - s.endUs > gapUs =>
                  closed ::= emit(uid, s)
                  Some(SessState(m, m, 1, dec(e.value)))
                case Some(s) =>
                  Some(SessState(s.startUs, m, s.n + 1, s.sum + dec(e.value)))
                case None =>
                  Some(SessState(m, m, 1, dec(e.value)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000L + GapMinutes * 60L * 1000L)
            }
            closed.reverse.iterator
          }
      }
  }

  /** Stream-static enrichment join: the streaming side joins a (broadcast)
    * static dimension per micro-batch — no state, no watermark needed; the
    * standard way to attach slowly-changing reference data to a stream.
    * Works identically when `events` is a batch frame. */
  def enrichWithTypes(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("category"), col("value"))

  /** foreachBatch incremental rollup maintenance: each micro-batch's delta
    * is partial-aggregated (count + exact DECIMAL sum per event_type) and
    * merged into driver-held state — the same associative decimal-merge
    * invariant as Lakehouse.q75IncrementalAgg, so the final state equals
    * the batch aggregate bit-for-bit. In production the merge lands in a
    * MERGE INTO against a table format; the state here is a map so the
    * spec can assert the invariant. Returns the final state as a frame. */
  def maintainRollup(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val state = scala.collection.mutable.Map.empty[String, (Long, BigDecimal)]
    val q = events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(30,6)")).as("s"))
          .collect().foreach { r =>
            val k = r.getString(0)
            val (n0, s0) = state.getOrElse(k, (0L, BigDecimal(0)))
            // sum() is null when every value in the batch group is null —
            // merge as zero rather than NPE-ing the stream.
            val delta = Option(r.getDecimal(2)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
            state(k) = (n0 + r.getLong(1), s0 + delta)
          }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.toSeq.map { case (k, (n, s)) => (k, n, s.toDouble) }
      .toDF("event_type", "n", "sum_value")
  }

  // --------------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q282 — the STREAMING windowed rollup itself under the driver hash
    // gate (until now streaming correctness was spec-only parity): the
    // events stream drains through Structured Streaming's stateful
    // window aggregation in COMPLETE mode with Trigger.AvailableNow —
    // the final emission is the converged full state, which must equal
    // the batch rollup the DuckDB oracle computes from the same table.
    // What the hash pins: epoch-aligned 10-minute window assignment,
    // exactly-once accumulation across micro-batch replays, and the
    // decimal-exact value sums — through the streaming engine's state
    // store, not the batch operator. Unique memory-sink name per call
    // (bench re-runs share a session); the leaked in-memory table is
    // window-count bounded.
    "q282_stream_windows" -> ((s, d) => {
      val res = runToBatch(s, windowedCounts(readStream(s, d)),
        s"graft_q282_${System.nanoTime()}", outputMode = "complete")
      res.orderBy(col("bucket"), col("event_type"))
    }),
    "q19_sessionize" -> ((s, d) => sessionWindows(Tables.events(s, d))),
    "q47_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      viewToPurchaseJoin(ev, ev)
        .orderBy(col("user_id"), col("purchase_ts"), col("view_ts"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q282_stream_windows" ->
      """SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000)
        |    AS bucket,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    "q47_interval_join" ->
      """SELECT p.user_id AS user_id, p.ts AS purchase_ts,
        |  p.value AS purchase_value, v.ts AS view_ts
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |ORDER BY p.user_id, purchase_ts, view_ts""".stripMargin,
    "q19_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 30*60*1000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin
  )
}
