package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** Round 16 (VERDICT r15 "what's missing" #3): CDF read-path pruning —
  * `changeFeed` / `table_changes` list their cdc sidecars and add-only
  * insert files through a stats index, so a filtered feed over a long
  * history opens only the files that can hold matching rows, and a
  * `_commit_version` / `_change_type` predicate prunes whole version
  * BRANCHES at optimization (the per-branch literals constant-fold). */
class Round16CdfPruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round16-cdf-prune", cores = 4)
  override def afterAll(): Unit = spark.stop()

  /** (rows, total numFiles over every file scan, number of file scans). */
  private def run(df: DataFrame): (Seq[org.apache.spark.sql.Row], Long, Int) = {
    val rows = df.collect().toSeq
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    (rows, scans.sum, scans.size)
  }

  private def mkFeedTable(): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-cdfprune").resolve("t").toString
    TxLog.create(t, org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, s STRING"))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    // three add-only commits with DISJOINT id ranges, one file each
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { r =>
      TxLog.append(spark, t,
        r.map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
    }
    // three cdc commits touching disjoint ids → three stats-bearing
    // sidecars
    Seq(5L, 15L, 25L).foreach { i =>
      TxLog.updateWhere(spark, t, col("id") === i, Map("s" -> lit(s"u$i")))
    }
    t
  }

  test("filtered feed opens only the files whose stats admit the predicate") {
    val t = mkFeedTable()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def feed = TxLog.changeFeed(spark, t, 0L)
      // unfiltered baseline: 3 insert files + 3 cdc sidecars of 2 part
      // files each (pre partition + post partition)
      val (all, nAll, _) = run(feed.select(col("id")))
      assert(all.size == 30 + 3 * 2, s"30 inserts + 3 pre/post pairs: ${all.size}")
      assert(nAll == 9L, s"unfiltered feed reads all 9 files, got $nAll")
      // id=5: one insert file + the two id=5 sidecar parts survive the
      // stats; the other two versions' sidecars and insert files prune
      val (hit, nHit, _) = run(feed.filter(col("id") === 5L)
        .select(col("id"), col(TxLog.ChangeTypeCol)))
      assert(hit.size == 3, s"insert + pre/post for id=5: ${hit.size}")
      assert(nHit == 3L, s"id=5 should open 3 of 9 files, got $nHit")
      // id=15 with a change-type predicate: insert branches fold away
      // entirely (lit('insert') ≠ 'update_postimage'), leaving ONE
      // cdc sidecar
      val (post, nPost, _) = run(feed
        .filter(col("id") === 15L &&
          col(TxLog.ChangeTypeCol) === "update_postimage")
        .select(col("id"), col("s")))
      assert(post.size == 1 && post.head.getString(1) == "u15")
      assert(nPost == 1L, s"one sidecar expected, got $nPost")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("_commit_version predicate prunes whole version branches at optimization") {
    val t = mkFeedTable()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val v = TxLog.versions(t).last // the id=25 update commit
      val df = TxLog.changeFeed(spark, t, 0L)
        .filter(col(TxLog.CommitVersionCol) === v)
        .select(col("id"), col(TxLog.ChangeTypeCol))
      val (rows, nFiles, nScans) = run(df)
      assert(rows.size == 2 && rows.forall(_.getLong(0) == 25L))
      assert(nScans == 1,
        s"non-matching version branches must fold to empty, got $nScans scans:\n" +
          df.queryExecution.executedPlan.collectLeaves()
            .map(_.toString.take(200)).mkString("\n"))
      assert(nFiles <= 2L) // the surviving sidecar's part files
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("table_changes TVF inherits the pruning; results exact") {
    val t = mkFeedTable()
    graft.sources.TxLogSqlDml.install(spark)
    val got = spark.sql(
      s"SELECT id, s, ${TxLog.ChangeTypeCol} FROM table_changes('$t', 1) " +
        "WHERE id = 15 AND _change_type = 'update_postimage'")
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 15L &&
      got.head.getString(1) == "u15")
  }

  test("pre-round-16 stats-less cdc actions are read, never skipped") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-cdfprune-old").resolve("t").toString
    TxLog.create(t, org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, s STRING"))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1))
    TxLog.updateWhere(spark, t, col("id") === 1L, Map("s" -> lit("A")))
    // strip the stats token off the cdc action (simulate an old log)
    val v = TxLog.versions(t).last
    val f = java.nio.file.Paths.get(t, "_graft_log", f"$v%020d.json")
    val rewritten = new String(Files.readAllBytes(f), "UTF-8").linesIterator
      .map { l =>
        if (l.contains("\"op\":\"cdc\""))
          l.replaceAll(",\"stats\":\"[^\"]*\"", "")
        else l
      }.mkString("\n")
    Files.write(f, rewritten.getBytes("UTF-8"))
    TxLog.invalidateActionCache(t)
    val got = TxLog.changeFeed(spark, t, v - 1)
      .filter(col("id") === 1L &&
        col(TxLog.ChangeTypeCol) === "update_postimage")
      .select(col("s")).collect()
    assert(got.length == 1 && got.head.getString(0) == "A",
      "stats-less sidecars must still be scanned")
  }
}
