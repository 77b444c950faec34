package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** Round 15: distributed CDF DV-delta fold (VERDICT r14 #1), CDC records
  * for TRUNCATE/OVERWRITE/RESTORE, skipChangeCommits on the CDF stream,
  * CDF x mergeSchema union alignment, batch startingVersion validation,
  * and vacuum's residual-directory sweep (ADVICE r14 #1/#2/#4/#5). */
class Round15CdfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round15-cdf", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-r15").resolve("t").toString

  private type Row3 = (Long, String, Long)
  private def rows(t: String): Seq[Row3] =
    TxLog.read(spark, t).select(col("id"), col("s"), col("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq

  private def fold(startDf: DataFrame, feed: DataFrame): Seq[Row3] = {
    val cols = Seq("id", "s", "n")
    val minus = feed.filter(col(TxLog.ChangeTypeCol)
      .isin("delete", "update_preimage")).select(cols.map(col): _*)
    val plus = feed.filter(col(TxLog.ChangeTypeCol)
      .isin("insert", "update_postimage")).select(cols.map(col): _*)
    startDf.select(cols.map(col): _*).exceptAll(minus).unionAll(plus)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  // ------------------- VERDICT r14 #1: distributed DV-delta derivation

  test("changeFeed DV deltas: distributed path == broadcast path, no driver sets") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      (1L to 200L).map(i => (i, s"r$i", i % 10)).toDF("id", "s", "n")
        .coalesce(4))
    val v0 = TxLog.versions(t).last
    // two cumulative MoR deletes: the second version's delta is its
    // fresh sidecars MINUS the first's vectors
    TxLog.deleteWhereMerge(spark, t, col("id") % 3 === 0)
    TxLog.deleteWhereMerge(spark, t, col("id") % 5 === 0)
    def deletes(): Seq[(Long, Long)] =
      TxLog.changeFeed(spark, t, v0)
        .filter(col(TxLog.ChangeTypeCol) === "delete")
        .select(col("id"), col(TxLog.CommitVersionCol)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val broadcastPath = deletes()
    // every deleted id appears exactly once, under the version that
    // killed it (15, 30, ... died at v1; 5, 10, 20 ... at v2)
    assert(broadcastPath.map(_._1) == (1L to 200L)
      .filter(i => i % 3 == 0 || i % 5 == 0).sorted)
    assert(broadcastPath.filter(_._1 % 3 == 0).forall(_._2 == v0 + 1))
    assert(broadcastPath.filter(p => p._1 % 5 == 0 && p._1 % 3 != 0)
      .forall(_._2 == v0 + 2))
    // force the distributed path (threshold below the position counts)
    System.setProperty("graft.txlog.dv.distributed", "4")
    try {
      assert(deletes() == broadcastPath,
        "distributed DV-delta fold must equal the broadcast path")
      val feed = TxLog.changeFeed(spark, t, v0)
        .filter(col(TxLog.ChangeTypeCol) === "delete")
      val plan = feed.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "above the threshold no position set may broadcast (= land on " +
          s"the driver); plan:\n$plan")
      // fold parity end-to-end under the distributed fold
      assert(fold(TxLog.read(spark, t, Some(v0)),
        TxLog.changeFeed(spark, t, v0)) == rows(t))
    } finally System.clearProperty("graft.txlog.dv.distributed")
  }

  // --------------------- ADVICE r14 #1: CDF x merge schema evolution

  test("merge with mergeSchema + CDF: the CDC union null-fills both sides") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    // source carries a NEW column: pre-images align from the OLD schema
    TxLog.merge(spark, t,
      Seq((1L, "a2", 11L), (9L, "i", 90L)).toDF("id", "s", "n"),
      Seq("id"), mergeSchema = true)
    val feed = TxLog.changeFeed(spark, t, v0)
    val got = feed.select(col(TxLog.ChangeTypeCol), col("id"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
    assert(got == Seq(("insert", 9L, 90L),
      ("update_postimage", 1L, 11L), ("update_preimage", 1L, -1L)),
      s"got $got")
    // and a SUBSET-column source (missing s) must not abort either
    TxLog.merge(spark, t, Seq((2L, 22L)).toDF("id", "n"), Seq("id"))
    val feed2 = TxLog.changeFeed(spark, t, TxLog.versions(t).last - 1)
    assert(feed2.filter(col(TxLog.ChangeTypeCol) === "update_postimage")
      .select(col("n")).head().getLong(0) == 22L)
  }

  // ----------------- ADVICE r14 #2: TRUNCATE/OVERWRITE/RESTORE records

  test("TRUNCATE on a CDF table records every row as delete") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    TxLog.truncate(t)
    val feed = TxLog.changeFeed(spark, t, v0)
    val got = feed.select(col(TxLog.ChangeTypeCol), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq(("delete", 1L), ("delete", 2L)), s"got $got")
    // and the stream does NOT wedge on the truncate commit
    streamAll(t).foreach { case (ct, _) => assert(ct.nonEmpty) }
  }

  test("OVERWRITE on a CDF table records delete(old) + insert(new)") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    TxLog.overwrite(spark, t,
      Seq((7L, "z", 70L)).toDF("id", "s", "n").coalesce(1))
    val feed = TxLog.changeFeed(spark, t, v0)
    val got = feed.select(col(TxLog.ChangeTypeCol), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq(("delete", 1L), ("delete", 2L), ("insert", 7L)),
      s"got $got")
    assert(fold(TxLog.read(spark, t, Some(v0)),
      TxLog.changeFeed(spark, t, v0)) == rows(t))
    // streaming tail delivers the same record
    val streamed = streamAll(t).sorted
    assert(streamed == Seq(("delete", 1L), ("delete", 2L),
      ("insert", 1L), ("insert", 2L), ("insert", 7L)), s"got $streamed")
  }

  test("RESTORE on a CDF table records the row-level diff (incl. DV state)") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    TxLog.append(spark, t, Seq((3L, "c", 30L)).toDF("id", "s", "n").coalesce(1))
    val target = TxLog.versions(t).last
    // a MoR delete AFTER the target: restoring resurrects row 1 via a
    // DV-state fix, and rolls back row 4's append
    TxLog.deleteWhereMerge(spark, t, col("id") === 1L)
    TxLog.append(spark, t, Seq((4L, "d", 40L)).toDF("id", "s", "n").coalesce(1))
    val preRestore = TxLog.versions(t).last
    TxLog.restore(t, target)
    assert(rows(t).map(_._1) == Seq(1L, 2L, 3L))
    val feed = TxLog.changeFeed(spark, t, preRestore)
    assert(fold(TxLog.read(spark, t, Some(preRestore)), feed) == rows(t),
      "folding the restore's CDC record onto the pre-restore snapshot " +
        "must reproduce the restored table")
    // rolled-back append surfaces as delete; resurrected row as insert
    val byType = feed.groupBy(col(TxLog.ChangeTypeCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.contains("delete") && byType.contains("insert"), s"$byType")
    // and the stream does not wedge
    streamAll(t)
  }

  // ------------------------ ADVICE r14 #2: skipChangeCommits on CDF

  test("CDF stream: skipChangeCommits skips pre-property change commits") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n").coalesce(1))
    TxLog.deleteWhere(spark, t, col("id") === 1L) // CDF off: no record
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    TxLog.updateWhere(spark, t, col("id") === 2L, Map("n" -> lit(22L)))
    // without the option: wedges on version 2, naming both escapes
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.TxLogSource")
        .option("readChangeFeed", "true").load(t)
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-r15-ck").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val msg = Seq(Option(e.getMessage), Option(e.getCause).flatMap(c =>
      Option(c.getMessage))).flatten.mkString(" ")
    assert(msg.contains("skipChangeCommits"), s"got: $msg")
    // with it: the CDC-less delete is skipped, everything else delivers
    val got = streamAll(t, skipChangeCommits = true).sorted
    assert(got == Seq(("insert", 1L), ("insert", 2L),
      ("update_postimage", 2L), ("update_preimage", 2L)), s"got $got")
  }

  /** Drain a CDF AvailableNow stream of `t`, returning (change_type, id). */
  private def streamAll(t: String,
                        skipChangeCommits: Boolean = false): Seq[(String, Long)] = {
    import org.apache.spark.sql.streaming.Trigger
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.readStream.format("graft.sources.TxLogSource")
      .option("readChangeFeed", "true")
      .option("skipChangeCommits", skipChangeCommits.toString).load(t)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col(TxLog.ChangeTypeCol), col("id")).collect()
          .foreach(r => got.add((r.getString(0), r.getLong(1))))
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-r15-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    got.toArray(Array.empty[(String, Long)]).toSeq
  }

  // --------------------- ADVICE r14 #4: batch startingVersion checks

  test("batch readChangeFeed validates startingVersion like the stream") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a", 1L)).toDF("id", "s", "n").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    def batch(sv: String): Long = spark.read
      .format("graft.sources.TxLogSource")
      .option("readChangeFeed", "true").option("startingVersion", sv)
      .load(t).count()
    assert(batch("1") == 1L)
    val eLatest = intercept[Exception] { batch("latest") }
    assert(eLatest.getMessage.contains("streaming"),
      s"'latest' must be refused by name, got: ${eLatest.getMessage}")
    val eZero = intercept[Exception] { batch("0") }
    assert(eZero.getMessage.contains(">= 1"), s"got: ${eZero.getMessage}")
  }

  // ----------------------- ADVICE r14 #5: vacuum residual directories

  test("vacuum survives a leftover _temporary directory in swept dirs") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a", 1L)).toDF("id", "s", "n").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    TxLog.deleteWhere(spark, t, col("id") === 1L) // stages a cdc dir
    TxLog.append(spark, t, Seq((2L, "b", 2L)).toDF("id", "s", "n").coalesce(1))
    // simulate a crashed stage: a non-empty _temporary under data and cdc
    def plant(root: java.nio.file.Path): Unit = {
      val sub = Files.list(root).iterator().next()
      val tempDir = sub.resolve("_temporary").resolve("0")
      Files.createDirectories(tempDir)
      Files.write(tempDir.resolve("task_x"), Array[Byte](1, 2, 3))
    }
    plant(java.nio.file.Paths.get(t, "data"))
    plant(java.nio.file.Paths.get(t, "cdc"))
    // must not throw DirectoryNotEmptyException, and must still sweep
    val deleted = TxLog.vacuum(t, retainVersions = 1, minAgeMillis = 0)
    assert(deleted.nonEmpty, s"vacuum swept nothing: $deleted")
    assert(rows(t).map(_._1) == Seq(2L)) // table content untouched
  }
}
