package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** Round 15: CDF read-surface parity (VERDICT r14 #5) — the
  * startingTimestamp option on batch and streaming readChangeFeed, and
  * the SQL-visible `table_changes(...)` TVF, with the q273-style
  * boundary probes on the CDF channel. */
class Round15CdfSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round15-cdfsurface", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-r15s").resolve("t").toString

  /** v1 append@1000, v2 (property), v3 update@3000, v4 delete@4000. */
  private def seed(): String = {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "n").coalesce(1),
      commitTs = Some(1000L))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"),
      commitTs = Some(2000L))
    TxLog.updateWhere(spark, t, col("id") === 1L, Map("n" -> lit(11L)),
      commitTs = Some(3000L))
    TxLog.deleteWhere(spark, t, col("id") === 2L, commitTs = Some(4000L))
    t
  }

  private def types(df: DataFrame): Seq[(String, Long)] =
    df.select(col(TxLog.ChangeTypeCol), col(TxLog.CommitVersionCol))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted

  test("batch readChangeFeed startingTimestamp: monotonized boundaries") {
    val t = seed()
    def batch(ts: Long): Seq[(String, Long)] = types(
      spark.read.format("graft.sources.TxLogSource")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", ts.toString).load(t))
    // ts between append and update -> update (v3) + delete (v4) only
    assert(batch(1500L) == Seq(("delete", 4L),
      ("update_postimage", 3L), ("update_preimage", 3L)))
    // boundary: exactly the update's commit time INCLUDES it (at-or-after)
    assert(batch(3000L) == Seq(("delete", 4L),
      ("update_postimage", 3L), ("update_preimage", 3L)))
    assert(batch(3001L) == Seq(("delete", 4L)))
    // from the very beginning: the append's inserts too
    assert(batch(1000L).size == 6)
    // past the whole history: loud batch error
    val e = intercept[Exception] { batch(9999L) }
    assert(e.getMessage.contains("at or after"), e.getMessage)
    // startingVersion and startingTimestamp are mutually exclusive
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.TxLogSource")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("startingTimestamp", "1000").load(t).count()
    }
    assert(e2.getMessage.contains("at most one"), e2.getMessage)
  }

  test("streaming CDF startingTimestamp: resolved at stream build") {
    import org.apache.spark.sql.streaming.Trigger
    val t = seed()
    def drain(ts: Long): Seq[(String, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
      spark.readStream.format("graft.sources.TxLogSource")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", ts.toString).load(t)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select(col(TxLog.ChangeTypeCol), col(TxLog.CommitVersionCol))
            .collect().foreach(r => got.add((r.getString(0), r.getLong(1))))
          ()
        }
        .option("checkpointLocation",
          Files.createTempDirectory("graft-r15s-ck").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      got.toArray(Array.empty[(String, Long)]).toSeq.sorted
    }
    assert(drain(3500L) == Seq(("delete", 4L)))
    // past the whole history: a stream starts at head (no backlog, no error)
    assert(drain(9999L) == Nil)
  }

  test("table_changes TVF: inclusive version bounds and timestamp form") {
    val t = seed()
    graft.sources.TxLogSqlDml.install(spark)
    def q(sql: String): Seq[(String, Long)] = types(spark.sql(sql))
    // inclusive both ends: [3, 3] = just the update
    assert(q(s"SELECT * FROM table_changes('$t', 3, 3)") ==
      Seq(("update_postimage", 3L), ("update_preimage", 3L)))
    // open end: [3, latest]
    assert(q(s"SELECT * FROM table_changes('$t', 3)") ==
      Seq(("delete", 4L), ("update_postimage", 3L), ("update_preimage", 3L)))
    // timestamp form: string second arg = epoch millis, at-or-after
    assert(q(s"SELECT * FROM table_changes('$t', '3001')") ==
      Seq(("delete", 4L)))
    // it is a real relation: filters/aggregates compose
    assert(spark.sql(s"SELECT count(*) AS c FROM table_changes('$t', 1) " +
      s"WHERE ${TxLog.ChangeTypeCol} = 'insert'").head().getLong(0) == 3L)
    // startVersion 0 refused like the reader option
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$t', 0)").collect()
    }
    assert(e.getMessage.contains(">= 1"), e.getMessage)
  }

  test("streams tail column-mapped tables (physical-name binding)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, 10L)).toDF("id", "n").coalesce(1))
    TxLog.renameColumn(t, "n", "m")
    TxLog.append(spark, t, Seq((2L, 20L)).toDF("id", "m").coalesce(1))
    // plain CDC stream: both eras' files deliver under the CURRENT
    // logical name (old files carry the physical name `n`, new ones the
    // same physical `n` via the write-seam translation)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    spark.readStream.format("graft.sources.TxLogSource").load(t)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select(col("id"), col("m")).collect()
          .foreach(r => got.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-r15s-rn").toString)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(got.toArray(Array.empty[(Long, Long)]).toSeq.sorted ==
      Seq((1L, 10L), (2L, 20L)))
    // CDF stream on a mapped table: post-rename DML delivers under the
    // new logical name
    val t2 = tmp()
    TxLog.append(spark, t2, Seq((1L, 10L)).toDF("id", "n").coalesce(1))
    TxLog.setProperties(t2, Map(TxLog.CdfProperty -> "true"))
    TxLog.renameColumn(t2, "n", "m")
    TxLog.updateWhere(spark, t2, col("id") === 1L, Map("m" -> lit(11L)))
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.readStream.format("graft.sources.TxLogSource")
      .option("readChangeFeed", "true").load(t2)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select(col(TxLog.ChangeTypeCol), col("m")).collect()
          .foreach(r => got2.add((r.getString(0),
            if (r.isNullAt(1)) -1L else r.getLong(1))))
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-r15s-rn2").toString)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val s2 = got2.toArray(Array.empty[(String, Long)]).toSeq.sorted
    assert(s2 == Seq(("insert", 10L),
      ("update_postimage", 11L), ("update_preimage", 10L)), s"got $s2")
  }

  test("_commit_timestamp rides every CDF channel (batch, TVF, stream)") {
    import org.apache.spark.sql.streaming.Trigger
    val t = seed()
    def tsOf(df: DataFrame): Map[Long, Long] =
      df.select(col(TxLog.CommitVersionCol), col(TxLog.CommitTimestampCol))
        .distinct().collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val expect = Map(1L -> 1000L, 3L -> 3000L, 4L -> 4000L)
    // batch reader option channel
    assert(tsOf(spark.read.format("graft.sources.TxLogSource")
      .option("readChangeFeed", "true").load(t)) == expect)
    // TVF channel
    graft.sources.TxLogSqlDml.install(spark)
    assert(tsOf(spark.sql(s"SELECT * FROM table_changes('$t', 1)")) == expect)
    // streaming channel
    val got = scala.collection.mutable.Map[Long, Long]()
    spark.readStream.format("graft.sources.TxLogSource")
      .option("readChangeFeed", "true").load(t)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        tsOf(b).foreach { case (k, v) => got.synchronized { got(k) = v } }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-r15s-ts").toString)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(got.toMap == expect, s"got $got")
  }
}
