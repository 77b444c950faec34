package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** Round-13 TxLog surface: dataChange-aware CDC (optimize rewrites never
  * re-delivered; change commits fail loudly or skip on opt-in), row-level
  * UPDATE, SQL DML (DELETE / UPDATE / MERGE INTO as statements), merge's
  * concurrent-append conflict detection, and time travel through DSv2
  * read options. */
class Round13OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round13-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-r13").resolve("t").toString

  private def rows(t: String, asOf: Option[Long] = None): Seq[(Long, String)] =
    TxLog.read(spark, t, asOf).select(col("id"), col("s")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  // ------------------------------------------------ dataChange / CDC

  test("optimize rewrites are not re-delivered by changes() or the stream") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, (1L to 3L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1))
    TxLog.append(spark, t, (4L to 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1))
    TxLog.optimize(spark, t, targetFiles = 1)
    // pre-fix, changes(0) delivered appends AND the compacted rewrite —
    // every row twice; now the increment equals the table exactly
    val inc = TxLog.changes(spark, t, 0L)
    assert(inc.count() == 6L)
    assert(inc.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 6L))
    // the optimize-only range is an EMPTY increment in the declared schema
    val empty = TxLog.changes(spark, t, 2L)
    assert(empty.isEmpty && empty.columns.toSeq == Seq("id", "s"))
    // streaming tail sees each row exactly once too
    val ckpt = Files.createTempDirectory("graft-r13-ckpt").toString
    val got = new java.util.concurrent.atomic.AtomicLong
    spark.readStream.format("graft.sources.TxLogSource").load(t)
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => { got.addAndGet(b.count()); () })
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(got.get() == 6L)
  }

  test("a change commit fails CDC loudly; skipChangeCommits opts in to skipping") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, (1L to 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1))
    TxLog.deleteWhere(spark, t, col("id") === 2L) // CoW change commit
    TxLog.append(spark, t, Seq((9L, "r9")).toDF("id", "s").coalesce(1))
    val e = intercept[IllegalStateException](TxLog.changes(spark, t, 0L).count())
    assert(e.getMessage.contains("change commit"))
    // opt-in: the change version is skipped whole; appends still arrive
    val skipped = TxLog.changes(spark, t, 0L, skipChangeCommits = true)
    assert(skipped.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 9L)) // v1's file is pre-delete, so id=2 rides along
    // MoR (DV) deletes are change commits too
    val t2 = tmp()
    TxLog.append(spark, t2, (1L to 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1))
    TxLog.deleteWhereMerge(spark, t2, col("id") === 1L)
    intercept[IllegalStateException](TxLog.changes(spark, t2, 0L).count())
    // the streaming source surfaces the same failure unless the option is set
    val ckpt = Files.createTempDirectory("graft-r13-ckpt2").toString
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      spark.readStream.format("graft.sources.TxLogSource").load(t)
        .writeStream
        .foreachBatch((_: DataFrame, _: Long) => ())
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(failed.getMessage.contains("change commit") ||
      Option(failed.getCause).exists(_.getMessage.contains("change commit")))
    val ckpt2 = Files.createTempDirectory("graft-r13-ckpt3").toString
    val got = new java.util.concurrent.atomic.AtomicLong
    spark.readStream.format("graft.sources.TxLogSource")
      .option("skipChangeCommits", "true").load(t)
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => { got.addAndGet(b.count()); () })
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(got.get() == 5L)
  }

  // ------------------------------------------------------ updateWhere

  test("updateWhere rewrites only affected files, original-value semantics") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("id", "s", "n").coalesce(1))
    TxLog.append(spark, t, Seq((3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "s", "n").coalesce(1))
    val untouched = TxLog.snapshot(t)(1) // second file: ids 3,4
    val v = TxLog.updateWhere(spark, t, col("id") === 1L,
      Map("s" -> lit("z"), "n" -> (col("n") + col("id"))))
    assert(v.contains(3L))
    // unaffected file survives bit-identically (no write amplification)
    assert(TxLog.snapshot(t).contains(untouched))
    val got = TxLog.read(spark, t).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "z", 11L), (2L, "b", 20L),
      (3L, "c", 30L), (4L, "d", 40L)))
    // swap semantics: assignments read ORIGINAL values
    TxLog.updateWhere(spark, t, col("id") === 2L,
      Map("n" -> (col("n") * 0L + col("id")), "id" -> col("n")))
    val swapped = TxLog.read(spark, t).filter(col("s") === "b")
      .select(col("id"), col("n")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(swapped.toSeq == Seq((20L, 2L)))
    // no-match is not a table change
    val vs = TxLog.versions(t).size
    assert(TxLog.updateWhere(spark, t, col("id") === 777L,
      Map("s" -> lit("x"))).isEmpty)
    assert(TxLog.versions(t).size == vs)
    // NULL-cond rows are not updated (three-valued semantics)
    val t2 = tmp()
    TxLog.append(spark, t2,
      Seq((1L, Some("a")), (2L, None: Option[String])).toDF("id", "s").coalesce(1))
    TxLog.updateWhere(spark, t2, col("s") =!= "zzz", Map("id" -> lit(99L)))
    assert(TxLog.read(spark, t2).filter(col("s").isNull)
      .select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("updateWhere enforces CHECK constraints and unknown columns") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("id", "n").coalesce(1))
    TxLog.addConstraint(spark, t, "n_pos", "n > 0")
    intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, t, col("id") === 1L, Map("n" -> lit(-5L)))
    }
    assert(rowsN(t) == Seq((1L, 10L), (2L, 20L))) // rejected write invisible
    intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, t, col("id") === 1L, Map("nope" -> lit(1L)))
    }
  }

  private def rowsN(t: String): Seq[(Long, Long)] =
    TxLog.read(spark, t).select(col("id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  // ---------------------------------------------------------- SQL DML

  test("SQL DELETE / UPDATE / MERGE INTO run as single TxLog commits") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    graft.sources.TxLogSqlDml.install(spark)
    val name = s"r13_dml_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name (id BIGINT, s STRING) USING " +
      s"graft.sources.TxLogSource OPTIONS (path '$t')")
    try {
      spark.sql(s"DELETE FROM $name WHERE id = 2")
      assert(rows(t) == Seq((1L, "a"), (3L, "c")))
      spark.sql(s"UPDATE $name SET s = concat(s, '!') WHERE id = 1")
      assert(rows(t) == Seq((1L, "a!"), (3L, "c")))
      spark.sql(
        s"""MERGE INTO $name USING (SELECT 3L AS id, 'x' AS s UNION ALL
           |SELECT 9L, 'n') src ON $name.id = src.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows(t) == Seq((1L, "a!"), (3L, "x"), (9L, "n")))
      // one statement = one commit: 1 append + 3 statements
      assert(TxLog.versions(t).size == 4)
      // SQL result ≡ API result: replay the same ops via the API on a twin
      val t2 = tmp()
      TxLog.append(spark, t2,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
      TxLog.deleteWhere(spark, t2, col("id") === 2L)
      TxLog.updateWhere(spark, t2, col("id") === 1L,
        Map("s" -> concat(col("s"), lit("!"))))
      TxLog.merge(spark, t2,
        Seq((3L, "x"), (9L, "n")).toDF("id", "s"), Seq("id"))
      assert(rows(t) == rows(t2))
      // round 14: a CONDITIONAL matched action routes to the general
      // mergeClauses engine instead of failing (VERDICT r13 #4) — the
      // guard fires only where its condition holds
      spark.sql(
        s"""MERGE INTO $name USING (SELECT 1L AS id, 'q' AS s UNION ALL
           |SELECT 9L, 'z') src ON $name.id = src.id
           |WHEN MATCHED AND src.s = 'q' THEN UPDATE SET *""".stripMargin)
      assert(rows(t) == Seq((1L, "q"), (3L, "x"), (9L, "n")))
      // still-unsupported forms fail loudly (non-equality ON)
      intercept[UnsupportedOperationException] {
        spark.sql(
          s"""MERGE INTO $name USING (SELECT 1L AS id, 'q' AS s) src
             |ON $name.id > src.id
             |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("SQL DML handles subqueries, IN-lists, CASE, and MERGE DELETE") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      (1L to 4L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1))
    TxLog.append(spark, t,
      (5L to 8L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1))
    graft.sources.TxLogSqlDml.install(spark)
    val name = s"r13_edge_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name (id BIGINT, s STRING) USING " +
      s"graft.sources.TxLogSource OPTIONS (path '$t')")
    try {
      // subquery-bearing conditions re-resolve against the fresh scan
      spark.sql(s"DELETE FROM $name WHERE id IN (SELECT 2L AS x)")
      spark.sql(s"DELETE FROM $name WHERE id IN (3, 999)")
      spark.sql(s"UPDATE $name SET s = CASE WHEN id = 1 THEN 'one' " +
        s"ELSE s END WHERE id <= 4")
      assert(rows(t).take(2) == Seq((1L, "one"), (4L, "s4")))
      // WHEN MATCHED THEN DELETE = keyed delete; the untouched file
      // (ids 5-8, added by version 2 and never rewritten since) must
      // survive the delete bit-identically
      val secondFile = TxLog.snapshot(t)
        .intersect(TxLog.snapshot(t, Some(2L))).head
      spark.sql(
        s"""MERGE INTO $name USING (SELECT 1L AS id UNION ALL SELECT 4L) src
           |ON $name.id = src.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(rows(t) == (5L to 8L).map(i => (i, s"s$i")))
      assert(TxLog.snapshot(t).contains(secondFile),
        "unmatched file must not rewrite under a keyed delete")
      // API equivalence
      val t2 = tmp()
      TxLog.append(spark, t2, (1L to 8L).map(i => (i, s"s$i")).toDF("id", "s"))
      TxLog.deleteMatched(spark, t2,
        Seq(1L, 2L, 3L, 4L).toDF("id"), Seq("id"))
      assert(rows(t2) == rows(t))
      // no-match delete commits nothing
      val vs = TxLog.versions(t2).size
      assert(TxLog.deleteMatched(spark, t2, Seq(777L).toDF("id"), Seq("id")).isEmpty)
      assert(TxLog.versions(t2).size == vs)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("racing SQL UPDATE statements serialize like API writers") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      (1L to 8L).map(i => (i, 0L)).toDF("id", "n").coalesce(2))
    graft.sources.TxLogSqlDml.install(spark)
    val name = s"r13_race_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name (id BIGINT, n BIGINT) USING " +
      s"graft.sources.TxLogSource OPTIONS (path '$t')")
    try {
      val pool = Executors.newFixedThreadPool(4)
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val incs = (1 to 4).map { _ =>
        Future { spark.sql(s"UPDATE $name SET n = n + 1 WHERE id <= 4") }
      }
      Await.result(Future.sequence(incs), scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
      // all four increments applied — no lost update
      val got = TxLog.read(spark, t).filter(col("id") <= 4L)
        .select(col("n")).collect().map(_.getLong(0)).toSeq
      assert(got == Seq.fill(4)(4L))
      assert(TxLog.versions(t).size == 5) // 1 append + 4 serialized updates
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  // --------------------------- merge concurrent-append conflict (storm)

  test("merge folds racing key-matching appends instead of duplicating keys") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      (1L to 4L).map(i => (i, 0L)).toDF("id", "n").coalesce(1))
    val pool = Executors.newFixedThreadPool(4)
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // appender storm: 6 appends all carrying key id=2 (matching the merge)
    val appends = Future {
      (1 to 6).foreach { k =>
        TxLog.append(spark, t, Seq((2L, 100L + k)).toDF("id", "n").coalesce(1))
      }
    }
    val merges = Future {
      (1 to 3).map { k =>
        TxLog.merge(spark, t, Seq((2L, 1000L + k)).toDF("id", "n"), Seq("id"))
      }
    }
    val mergeVs = Await.result(merges, scala.concurrent.duration.Duration.Inf)
    Await.result(appends, scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // the keyed-upsert invariant AT each merge's commit point: exactly one
    // live row for the merged key — a racer's append either serialized
    // before (folded by the rebase) or after (not yet visible at v)
    mergeVs.foreach { v =>
      val n = TxLog.read(spark, t, Some(v)).filter(col("id") === 2L).count()
      assert(n == 1L, s"version $v holds $n rows for merged key 2")
    }
  }

  // ---------------------------- distributed DV loading (scale path)

  test("massive-DV reads route through the distributed sidecar scan") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, (1L to 200L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(4))
    TxLog.deleteWhereMerge(spark, t, col("id") % 3 === 0)
    val expect = (1L to 200L).filter(_ % 3 != 0)
    // baseline: broadcast path
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    // force the distributed path (threshold below the 66 live positions)
    // and assert identical content through the shuffled anti-join
    System.setProperty("graft.txlog.dv.distributed", "4")
    try {
      val got = TxLog.read(spark, t)
      assert(got.select(col("id")).collect()
        .map(_.getLong(0)).sorted.toSeq == expect)
      // the plan really did demote: no broadcast join on the DV side
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "distributed DV path must not broadcast the position set")
      // a second MoR delete through the same path stays cumulative
      TxLog.deleteWhereMerge(spark, t, col("id") === 1L)
      assert(TxLog.read(spark, t).select(col("id")).collect()
        .map(_.getLong(0)).sorted.toSeq == expect.filterNot(_ == 1L))
    } finally System.clearProperty("graft.txlog.dv.distributed")
  }

  // ------------------------------------------ time travel read options

  test("versionAsOf / timestampAsOf read options pin snapshots") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"), commitTs = Some(1000L))
    TxLog.append(spark, t, Seq((2L, "b")).toDF("id", "s"), commitTs = Some(2000L))
    def load(opts: (String, String)*): DataFrame = {
      val r = spark.read.format("graft.sources.TxLogSource")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(t)
    }
    assert(load().count() == 2L)
    assert(load("versionAsOf" -> "1").select(col("id"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(load("timestampAsOf" -> "1500").select(col("id"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(load("timestampAsOf" -> "2000").count() == 2L) // boundary inclusive
    intercept[IllegalArgumentException] {
      load("timestampAsOf" -> "500").count() // before first commit
    }
    intercept[IllegalArgumentException] {
      load("versionAsOf" -> "1", "timestampAsOf" -> "1500").count()
    }
    // schema evolution: old snapshot binds its contemporary columns
    TxLog.append(spark, t, Seq((3L, "c", 9L)).toDF("id", "s", "extra"),
      mergeSchema = true, commitTs = Some(3000L))
    assert(load("versionAsOf" -> "2").columns.toSeq == Seq("id", "s"))
    assert(load().columns.toSeq == Seq("id", "s", "extra"))
  }
}
