package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** ALTER COLUMN TYPE — type widening (round 13): metadata-only, old
  * narrow files decode under the wide declaration, mixed-era tables
  * aggregate exactly, stats pruning stays exact across the type seam,
  * and the guards (unsupported widenings, partition/generated columns,
  * RESTORE across a widen) all refuse loudly. */
class TxLogWidenColumnSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-widen-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def freshTable(): String =
    Files.createTempDirectory("graft-widen").resolve("t").toString

  test("widen int->long: metadata-only, mixed-era reads exact, writers must go wide") {
    import spark.implicits._
    val t = freshTable()
    TxLog.append(spark, t, Seq((1, "a"), (2, "b")).toDF("id", "s").coalesce(1))
    val filesBefore = TxLog.snapshot(t).sorted
    TxLog.widenColumn(t, "id", LongType)
    assert(TxLog.snapshot(t).sorted == filesBefore, "widen must not touch files")
    assert(TxLog.schemaOf(t).get("id").dataType == LongType)
    // narrow-era file decodes under the wide declaration
    assert(TxLog.read(spark, t).schema("id").dataType == LongType)
    // post-widen append carries long; the mixed-era aggregate is exact
    TxLog.append(spark, t, Seq((3000000000L, "c")).toDF("id", "s").coalesce(1))
    assert(TxLog.read(spark, t).agg(sum(col("id"))).collect()(0)
      .getLong(0) == 3000000003L)
    // a writer still supplying int bounces (type equality, loud)
    intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((4, "d")).toDF("id", "s"))
    }
    // time travel before the widen reads the contemporary (int) type
    assert(TxLog.read(spark, t, asOf = Some(1L)).schema("id").dataType ==
      IntegerType)
  }

  test("stats pruning stays exact across the type seam") {
    import spark.implicits._
    val t = freshTable()
    TxLog.append(spark, t, (1 to 100).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1))
    TxLog.widenColumn(t, "id", LongType)
    TxLog.append(spark, t, (1000000L to 1000100L).map(i => (i, s"r$i"))
      .toDF("id", "s").coalesce(1))
    // predicate typed LONG against the int-era file's stats: the
    // exact-decimal key domain prunes the int file, keeps the long file
    val pr = TxLog.prune(spark, t, col("id") >= 1000000L)
    assert(pr.kept.size == 1 && pr.skipped.size == 1,
      s"expected 1 kept / 1 skipped, got ${pr.kept.size}/${pr.skipped.size}")
    assert(TxLog.readWhere(spark, t, col("id") >= 1000000L).count() == 101)
    // and the reverse direction keeps only the narrow file
    val pr2 = TxLog.prune(spark, t, col("id") <= 50L)
    assert(pr2.kept.size == 1 && pr2.skipped.size == 1)
  }

  test("float->double widen; unsupported widenings refuse") {
    import spark.implicits._
    val t = freshTable()
    TxLog.append(spark, t, Seq((1L, 1.5f)).toDF("id", "x").coalesce(1))
    TxLog.widenColumn(t, "x", DoubleType)
    assert(TxLog.read(spark, t).agg(sum(col("x"))).collect()(0)
      .getDouble(0) == 1.5)
    intercept[IllegalArgumentException] { // long -> double is lossy
      TxLog.widenColumn(t, "id", DoubleType)
    }
    intercept[IllegalArgumentException] { // narrowing
      TxLog.widenColumn(t, "x", FloatType)
    }
    intercept[IllegalArgumentException] { // string change
      TxLog.widenColumn(t, "id", StringType)
    }
  }

  test("partition and generated columns refuse; RESTORE across a widen refuses") {
    import spark.implicits._
    val t = freshTable()
    TxLog.append(spark, t, Seq((1, "a")).toDF("id", "s").coalesce(1),
      partitionBy = Seq("s"))
    intercept[IllegalArgumentException] { TxLog.widenColumn(t, "s", LongType) }
    val vW = TxLog.widenColumn(t, "id", LongType)
    val e = intercept[UnsupportedOperationException] { TxLog.restore(t, vW - 1) }
    assert(e.getMessage.contains("TYPE change"))
  }

  test("SQL ALTER TABLE ALTER COLUMN TYPE lands the commit") {
    import spark.implicits._
    val t = freshTable()
    TxLog.append(spark, t, Seq((1, "a")).toDF("id", "s").coalesce(1))
    graft.sources.TxLogSqlDml.install(spark)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
      graft.sources.GraftSqlParser.maintenance(
        s"ALTER TABLE '$t' ALTER COLUMN id TYPE BIGINT").get).collect()
    assert(TxLog.schemaOf(t).get("id").dataType == LongType)
    assert(TxLog.history(t).exists(_.operation == "ALTER COLUMN"))
  }
}
