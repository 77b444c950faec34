package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog
import graft.etl.TxLog.MergeClause

/** Round 14: the GENERAL MERGE grammar (conditional WHEN clauses,
  * partial-column UPDATE SET, NOT MATCHED BY SOURCE) and the row-level
  * CHANGE DATA FEED (VERDICT r13 #4/#5). */
class TxLogMergeCdfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-merge-cdf", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-mcdf").resolve("t").toString

  private def rows(t: String): Seq[(Long, String, Long)] =
    TxLog.read(spark, t).select(col("id"), col("s"), col("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq

  private def seed(t: String): Unit = {
    import spark.implicits._
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
        .toDF("id", "s", "n").coalesce(2))
  }

  test("mergeClauses: conditional update, delete, partial columns, BY SOURCE") {
    import spark.implicits._
    val t = tmp(); seed(t)
    // source: 1 (update if n<15), 2 (delete), 9 (insert), 10 (insert-blocked)
    val src = Seq((1L, 100L), (2L, 200L), (9L, 900L), (10L, 42L))
      .toDF("id", "delta")
    val v = TxLog.mergeClauses(spark, t, src, Seq("id"),
      matched = Seq(
        MergeClause("delete", Some(expr("t.id = 2")), Map.empty),
        MergeClause("update", Some(expr("t.n < 15")),
          Map("n" -> expr("t.n + s.delta")))),
      notMatched = Seq(
        MergeClause("insert", Some(expr("s.delta > 100")),
          Map("id" -> expr("s.id"), "s" -> lit("new"), "n" -> expr("s.delta")))),
      notMatchedBySource = Seq(
        MergeClause("update", Some(expr("t.id = 4")),
          Map("s" -> expr("concat(t.s, '?')")))))
    assert(v.isDefined)
    // 1: matched, delete-guard false, update-guard (10<15) true -> n=110
    // 2: matched, deleted
    // 3: not matched by source, BY SOURCE guard (id=4) false -> unchanged
    // 4: not matched by source, updated s -> "d?"
    // 9: unmatched, delta>100 -> inserted ("new", 900)
    // 10: unmatched, delta=42 fails the guard -> ignored
    assert(rows(t) == Seq((1L, "a", 110L), (3L, "c", 30L), (4L, "d?", 40L),
      (9L, "new", 900L)))
  }

  test("mergeClauses: first-match-wins ordering and no-clause fallthrough") {
    import spark.implicits._
    val t = tmp(); seed(t)
    val src = Seq((1L, 1L), (3L, 3L)).toDF("id", "delta")
    TxLog.mergeClauses(spark, t, src, Seq("id"),
      matched = Seq(
        MergeClause("update", Some(expr("t.id = 1")), Map("n" -> lit(111L))),
        // second clause would also hit id=1; first wins
        MergeClause("update", None, Map("n" -> lit(999L)))),
      notMatched = Nil)
    assert(rows(t) == Seq((1L, "a", 111L), (2L, "b", 20L), (3L, "c", 999L),
      (4L, "d", 40L)))
    // a merge whose clauses all miss commits nothing
    val before = TxLog.versions(t).size
    val r = TxLog.mergeClauses(spark, t, Seq((7L, 0L)).toDF("id", "delta"),
      Seq("id"),
      matched = Seq(MergeClause("update", None, Map("n" -> lit(0L)))),
      notMatched = Seq(MergeClause("insert", Some(lit(false)),
        Map("id" -> expr("s.id")))))
    assert(r.isEmpty && TxLog.versions(t).size == before)
  }

  test("SQL MERGE: full grammar — conditional, partial SET, BY SOURCE") {
    import spark.implicits._
    val t = tmp(); seed(t)
    graft.sources.TxLogSqlDml.install(spark)
    val name = s"r14_merge_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name (id BIGINT, s STRING, n BIGINT) USING " +
      s"graft.sources.TxLogSource OPTIONS (path '$t')")
    try {
      spark.sql(
        s"""MERGE INTO $name USING (
           |  SELECT 1L AS id, 5L AS delta UNION ALL
           |  SELECT 2L, 7L UNION ALL
           |  SELECT 9L, 900L) src
           |ON $name.id = src.id
           |WHEN MATCHED AND $name.n >= 20 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET n = $name.n + src.delta
           |WHEN NOT MATCHED AND src.delta > 100 THEN
           |  INSERT (id, s, n) VALUES (src.id, 'ins', src.delta)
           |WHEN NOT MATCHED BY SOURCE AND $name.id = 4 THEN
           |  UPDATE SET s = upper($name.s)""".stripMargin)
      // 1: matched, n=10 < 20 -> n += 5; 2: matched, n=20 -> deleted;
      // 3: by-source, guard false -> unchanged; 4: by-source -> s=D;
      // 9: inserted
      assert(rows(t) == Seq((1L, "a", 15L), (3L, "c", 30L), (4L, "D", 40L),
        (9L, "ins", 900L)))
      // one statement = one commit
      assert(TxLog.versions(t).size == 2)
      // SQL ≡ API: same clauses through mergeClauses on a twin table
      val t2 = tmp(); seed(t2)
      TxLog.mergeClauses(spark, t2,
        Seq((1L, 5L), (2L, 7L), (9L, 900L)).toDF("id", "delta"), Seq("id"),
        matched = Seq(
          MergeClause("delete", Some(expr("t.n >= 20")), Map.empty),
          MergeClause("update", None, Map("n" -> expr("t.n + s.delta")))),
        notMatched = Seq(MergeClause("insert", Some(expr("s.delta > 100")),
          Map("id" -> expr("s.id"), "s" -> lit("ins"), "n" -> expr("s.delta")))),
        notMatchedBySource = Seq(MergeClause("update",
          Some(expr("t.id = 4")), Map("s" -> expr("upper(t.s)")))))
      assert(rows(t) == rows(t2))
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("mergeClauses rebase: a racing append's key-matching rows are re-read") {
    import spark.implicits._
    val t = tmp(); seed(t)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fM = pool.submit(new Runnable { def run(): Unit = { start.await()
      TxLog.mergeClauses(spark, t,
        Seq((1L, 1000L), (2L, 1000L)).toDF("id", "delta"), Seq("id"),
        matched = Seq(MergeClause("update", Some(expr("t.n < 500")),
          Map("n" -> expr("t.n + s.delta")))),
        notMatched = Nil); () } })
    val fA = pool.submit(new Runnable { def run(): Unit = { start.await()
      TxLog.append(spark, t,
        Seq((7L, "g", 70L)).toDF("id", "s", "n").coalesce(1)); () } })
    start.countDown()
    fM.get(180, TimeUnit.SECONDS); fA.get(180, TimeUnit.SECONDS)
    pool.shutdown()
    // both effects present whatever the commit order: appended row lives,
    // conditional updates applied exactly once
    assert(rows(t) == Seq((1L, "a", 1010L), (2L, "b", 1020L), (3L, "c", 30L),
      (4L, "d", 40L), (7L, "g", 70L)))
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns widen the declaration") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1))
    // API: source carries a NEW column; mergeSchema widens in one commit
    TxLog.merge(spark, t,
      Seq((2L, "b2", 20L), (3L, "c", 30L)).toDF("id", "s", "extra"),
      Seq("id"), mergeSchema = true)
    val got = TxLog.read(spark, t)
      .select(col("id"), col("s"), col("extra"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    // survivor row 1 null-fills the new column; matched row 2 replaced
    assert(got == Seq((1L, "a", -1L), (2L, "b2", 20L), (3L, "c", 30L)))
    assert(TxLog.schemaOf(t).get.fieldNames.toSeq == Seq("id", "s", "extra"))
    // without the flag, the same source still refuses
    intercept[IllegalArgumentException] {
      TxLog.merge(spark, t,
        Seq((1L, "x", 1L, 9L)).toDF("id", "s", "extra", "more"), Seq("id"))
    }
    // SQL surface: WITH SCHEMA EVOLUTION on the star form
    graft.sources.TxLogSqlDml.install(spark)
    val name = s"r14_evo_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name (id BIGINT, s STRING, extra BIGINT) " +
      s"USING graft.sources.TxLogSource OPTIONS (path '$t')")
    try {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $name USING
           |(SELECT 9L AS id, 'i' AS s, 90L AS extra, 900L AS more) src
           |ON $name.id = src.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(TxLog.schemaOf(t).get.fieldNames.toSeq ==
        Seq("id", "s", "extra", "more"))
      assert(TxLog.read(spark, t).filter(col("id") === 9L)
        .select(col("more")).head().getLong(0) == 900L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  // ------------------------------------------------------------- CDF

  /** Multiset fold of a change feed onto a start snapshot: removals are
    * deletes + update_preimages, additions inserts + update_postimages. */
  private def fold(startDf: DataFrame, feed: DataFrame): Seq[Row3] = {
    val cols = Seq("id", "s", "n")
    val minus = feed.filter(col(TxLog.ChangeTypeCol)
      .isin("delete", "update_preimage")).select(cols.map(col): _*)
    val plus = feed.filter(col(TxLog.ChangeTypeCol)
      .isin("insert", "update_postimage")).select(cols.map(col): _*)
    val folded = startDf.select(cols.map(col): _*)
      .exceptAll(minus).unionAll(plus)
    folded.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }
  private type Row3 = (Long, String, Long)

  test("changeFeed: exact row-level record on a CDF-enabled table") {
    import spark.implicits._
    val t = tmp(); seed(t)
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    TxLog.updateWhere(spark, t, col("id") === 1L, Map("n" -> lit(11L)))
    TxLog.deleteWhere(spark, t, col("id") === 2L)
    TxLog.merge(spark, t, Seq((3L, "cc", 33L), (9L, "i", 90L)).toDF("id", "s", "n"),
      Seq("id"))
    val feed = TxLog.changeFeed(spark, t, v0)
    val byType = feed.groupBy(TxLog.ChangeTypeCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // update(1 row) + merge-update(1 row) = 2 pre + 2 post; delete 1; insert 1
    assert(byType == Map("update_preimage" -> 2L, "update_postimage" -> 2L,
      "delete" -> 1L, "insert" -> 1L))
    // pre/post pairs carry the right content
    val post = feed.filter(col(TxLog.ChangeTypeCol) === "update_postimage")
      .select(col("id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(post == Set((1L, 11L), (3L, 33L)))
    // fold(start, feed) == end snapshot
    assert(fold(TxLog.read(spark, t, Some(v0)), feed) == rows(t))
    // _commit_version names each increment's commit
    assert(feed.select(TxLog.CommitVersionCol).distinct().count() == 3L)
  }

  test("changeFeed: derived record — appends, coarse change commits, optimize invisible, DV deltas") {
    import spark.implicits._
    val t = tmp(); seed(t) // CDF property OFF
    val v0 = TxLog.versions(t).last
    // append -> derived inserts
    TxLog.append(spark, t, Seq((5L, "e", 50L)).toDF("id", "s", "n").coalesce(1))
    // CoW delete without cdc -> coarse delete+insert, still fold-correct
    TxLog.deleteWhere(spark, t, col("id") === 2L)
    // MoR delete -> DV delta derived as exact deletes
    TxLog.deleteWhereMerge(spark, t, col("id") === 3L)
    // optimize -> invisible
    TxLog.optimize(spark, t, targetFiles = 1)
    val feed = TxLog.changeFeed(spark, t, v0)
    assert(fold(TxLog.read(spark, t, Some(v0)), feed) == rows(t))
    // the optimize version contributes no rows
    val optV = TxLog.versions(t).last
    assert(feed.filter(col(TxLog.CommitVersionCol) === optV).count() == 0L)
    // the DV version contributes exactly one delete of row 3
    val dvRows = feed.filter(col(TxLog.ChangeTypeCol) === "delete")
      .filter(col("id") === 3L).count()
    assert(dvRows == 1L)
    // empty range -> empty frame in the CDF schema
    val empty = TxLog.changeFeed(spark, t, TxLog.versions(t).last)
    assert(empty.count() == 0L &&
      empty.columns.contains(TxLog.ChangeTypeCol))
  }

  test("streaming CDF: readChangeFeed tails row-level changes, exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val t = tmp()
    val ckpt = Files.createTempDirectory("graft-cdf-ckpt").toString
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    TxLog.updateWhere(spark, t, col("id") === 1L, Map("n" -> lit(11L)))
    TxLog.deleteWhere(spark, t, col("id") === 2L)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def drain(): Unit = spark.readStream
      .format("graft.sources.TxLogSource")
      .option("readChangeFeed", "true").load(t)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col(TxLog.ChangeTypeCol), col("id"), col("n")).collect()
          .foreach(r => got.add((r.getString(0), r.getLong(1), r.getLong(2))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    drain()
    val first = got.toArray(Array.empty[(String, Long, Long)]).toSeq.sorted
    assert(first == Seq(
      ("delete", 2L, 20L),
      ("insert", 1L, 10L), ("insert", 2L, 20L),
      ("update_postimage", 1L, 11L), ("update_preimage", 1L, 10L)),
      s"got $first")
    // restart on the same checkpoint delivers only NEW changes — and a
    // change commit no longer needs skipChangeCommits to stream
    got.clear()
    TxLog.deleteWhereMerge(spark, t, col("id") === 1L)
    drain()
    val second = got.toArray(Array.empty[(String, Long, Long)]).toSeq.sorted
    assert(second == Seq(("delete", 1L, 11L)), s"got $second")
    // a change commit WITHOUT a CDC record refuses loudly in a stream,
    // naming the property (the batch changeFeed still derives it)
    val t2 = tmp()
    TxLog.append(spark, t2, Seq((1L, "a", 1L)).toDF("id", "s", "n").coalesce(1))
    TxLog.deleteWhere(spark, t2, col("id") === 1L) // CDF off: no record
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.TxLogSource")
        .option("readChangeFeed", "true").load(t2)
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cdf-ckpt2").toString)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getMessage != null && (e.getMessage.contains(TxLog.CdfProperty) ||
      Option(e.getCause).exists(_.getMessage.contains(TxLog.CdfProperty))),
      s"error must name the property, got: ${e.getMessage}")
  }

  test("batch DSv2 CDF read: readChangeFeed over the whole history") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "n").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    TxLog.updateWhere(spark, t, col("id") === 2L, Map("n" -> lit(22L)))
    val feed = spark.read.format("graft.sources.TxLogSource")
      .option("readChangeFeed", "true").load(t)
    val got = feed.select(col(TxLog.ChangeTypeCol), col("id"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(got == Seq(("insert", 1L, 10L), ("insert", 2L, 20L),
      ("update_postimage", 2L, 22L), ("update_preimage", 2L, 20L)))
  }

  test("changeFeed: mergeClauses CDC record and vacuum retention") {
    import spark.implicits._
    val t = tmp(); seed(t)
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    TxLog.mergeClauses(spark, t,
      Seq((1L, 100L), (2L, 0L), (9L, 900L)).toDF("id", "delta"), Seq("id"),
      matched = Seq(
        MergeClause("delete", Some(expr("s.delta = 0")), Map.empty),
        MergeClause("update", None, Map("n" -> expr("t.n + s.delta")))),
      notMatched = Seq(MergeClause("insert", None,
        Map("id" -> expr("s.id"), "s" -> lit("i"), "n" -> expr("s.delta")))))
    val feed = TxLog.changeFeed(spark, t, v0)
    val byType = feed.groupBy(TxLog.ChangeTypeCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L, "insert" -> 1L))
    assert(fold(TxLog.read(spark, t, Some(v0)), feed) == rows(t))
    // vacuum with tight retention sweeps old cdc files; the recent
    // window's CDF still reads
    TxLog.append(spark, t, Seq((20L, "t", 1L)).toDF("id", "s", "n").coalesce(1))
    val deleted = TxLog.vacuum(t, retainVersions = 1, minAgeMillis = 0)
    assert(deleted.exists(_.startsWith("cdc/")),
      s"expected cdc sweep, got $deleted")
    val recent = TxLog.changeFeed(spark, t, TxLog.versions(t).last - 1)
    assert(recent.filter(col(TxLog.ChangeTypeCol) === "insert").count() == 1L)
  }
}
