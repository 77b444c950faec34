package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** TRUNCATE TABLE + CREATE TABLE AS SELECT for the TxLog format
  * (round 13): truncate empties content but never identity; CTAS through
  * the graft catalog creates-and-fills in one statement (non-atomic
  * two-commit, the plain-TableCatalog contract — createTable then the
  * INSERT's ACID commit). */
class TxLogTruncateCtasSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = GraftSession.local("txlog-trunc-ctas-spec", cores = 4)
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def freshPath(): String =
    Files.createTempDirectory("graft-tc").resolve("t").toString

  test("truncate empties content; schema/partitioning/constraints survive; travel intact") {
    import spark.implicits._
    val t = freshPath()
    TxLog.append(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1),
      partitionBy = Seq("s"))
    TxLog.addConstraint(spark, t, "id_pos", "id > 0")
    val vT = TxLog.truncate(t).get
    assert(TxLog.snapshot(t).isEmpty, "truncate must empty the live set")
    assert(TxLog.schemaOf(t).get.fieldNames.toSeq == Seq("id", "s"),
      "schema survives")
    assert(TxLog.partColsOf(t) == Seq("s"), "partitioning survives")
    assert(TxLog.constraintsOf(t).contains("id_pos"), "constraints survive")
    // pre-truncate snapshot still reads (files on disk until VACUUM)
    assert(TxLog.read(spark, t, asOf = Some(vT - 1)).count() == 2)
    // double truncate is a no-op, not a new commit
    assert(TxLog.truncate(t).isEmpty)
    // the table is still writable and the constraint still bites
    TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s").coalesce(1))
    assert(TxLog.read(spark, t).count() == 1)
    intercept[Exception] {
      TxLog.append(spark, t, Seq((-1L, "bad")).toDF("id", "s"))
    }
  }

  test("SQL TRUNCATE TABLE '<path>' lands the commit; racing append never half-survives") {
    import spark.implicits._
    val t = freshPath()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s").coalesce(1))
    graft.sources.TxLogSqlDml.install(spark)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
      graft.sources.GraftSqlParser.maintenance(
        s"TRUNCATE TABLE '$t'").get).collect()
    assert(TxLog.snapshot(t).isEmpty)
    assert(TxLog.history(t).exists(_.operation == "TRUNCATE"))
  }

  test("CTAS through the graft catalog: create + fill in one statement") {
    val t = freshPath()
    spark.range(1, 6).createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE graft.`$t` AS SELECT id, id * 2 AS dbl FROM ctas_src")
    assert(TxLog.schemaOf(t).get.fieldNames.toSeq == Seq("id", "dbl"))
    assert(TxLog.read(spark, t).count() == 5)
    assert(spark.sql(s"SELECT sum(dbl) FROM graft.`$t`").collect()(0)
      .getLong(0) == 30L)
    // CTAS on an existing table refuses (no silent replace)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$t` AS SELECT 1 AS x")
    }
  }

  test("storm: truncate racing appends — every append wholly survives or is wholly truncated") {
    import spark.implicits._
    val t = freshPath()
    TxLog.append(spark, t, Seq((0L, "seed")).toDF("id", "s").coalesce(1))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    val start = new java.util.concurrent.CountDownLatch(1)
    val futs = (1 to 4).map { w =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { start.await()
          TxLog.append(spark, t,
            Seq((w.toLong, s"w$w")).toDF("id", "s").coalesce(1)) }
      })
    }
    val truncF = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await(); TxLog.truncate(t).get }
    })
    start.countDown()
    val appendVs = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    val vT = truncF.get(120, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    // serialized versions, none lost
    assert(TxLog.versions(t) == (1L to 6L), "6 commits must serialize")
    // the truncate's snapshot is empty; appends that committed after it
    // survive wholly — final row ids = exactly the post-truncate writers
    assert(TxLog.snapshot(t, Some(vT)).isEmpty)
    val survivors = appendVs.zipWithIndex.collect {
      case (v, i) if v > vT => (i + 1).toLong }.sorted
    val finalIds = TxLog.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq
    assert(finalIds == survivors,
      s"live rows $finalIds must be exactly the post-truncate appends $survivors")
  }

  test("CTAS with PARTITIONED BY declares identity partitioning") {
    val t = freshPath()
    spark.range(0, 10)
      .selectExpr("id", "CAST(id % 2 AS STRING) AS bucket")
      .createOrReplaceTempView("ctas_part_src")
    spark.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (bucket) " +
      "AS SELECT * FROM ctas_part_src")
    assert(TxLog.partColsOf(t) == Seq("bucket"))
    assert(TxLog.read(spark, t).filter(col("bucket") === "1").count() == 5)
  }
}
