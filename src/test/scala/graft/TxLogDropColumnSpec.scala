package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** ALTER TABLE … DROP COLUMN (round 13): metadata-only schema narrowing
  * with a physical-name tombstone. Pins: no data file touched, reads
  * stop projecting the column, time travel still sees it, the tombstone
  * blocks stale-data resurrection through re-ADD / mergeSchema, the
  * rename-chain entry dies with a mapped column, RESTORE semantics, and
  * every refusal (partition / last / constraint / bloom / generated). */
class TxLogDropColumnSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-drop-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def freshTable(): String =
    Files.createTempDirectory("graft-drop").resolve("t").toString

  private def seed(table: String): Unit = {
    import spark.implicits._
    TxLog.append(spark, table,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "x").coalesce(1))
  }

  test("drop is metadata-only: files untouched, column gone, travel intact") {
    val t = freshTable(); seed(t)
    val filesBefore = TxLog.snapshot(t).sorted
    val v = TxLog.dropColumn(t, "x")
    assert(TxLog.snapshot(t).sorted == filesBefore, "drop must not touch data files")
    assert(TxLog.schemaOf(t).get.fieldNames.toSeq == Seq("id", "s"))
    assert(TxLog.read(spark, t).columns.toSeq == Seq("id", "s"))
    // time travel BEFORE the drop still reads the column's values
    val old = TxLog.read(spark, t, asOf = Some(v - 1))
    assert(old.columns.contains("x"))
    assert(old.select(sum(col("x"))).collect()(0).getDouble(0) == 30.0)
    assert(TxLog.droppedPhysicalOf(t) == Set("x"))
  }

  test("append after drop omits the column; supplying it bounces") {
    import spark.implicits._
    val t = freshTable(); seed(t)
    TxLog.dropColumn(t, "x")
    TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s").coalesce(1))
    assert(TxLog.read(spark, t).count() == 3)
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((4L, "d", 40.0)).toDF("id", "s", "x"))
    }
    assert(e.getMessage.contains("mergeSchema"))
  }

  test("tombstone blocks re-declaration via ADD COLUMNS and mergeSchema") {
    import spark.implicits._
    val t = freshTable(); seed(t)
    TxLog.dropColumn(t, "x")
    val e1 = intercept[IllegalArgumentException] {
      TxLog.addColumns(t, org.apache.spark.sql.types.StructType.fromDDL("x DOUBLE"))
    }
    assert(e1.getMessage.contains("DROPped"))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((4L, "d", 40.0)).toDF("id", "s", "x"),
        mergeSchema = true)
    }
    assert(e2.getMessage.toLowerCase.contains("drop"))
    // a DIFFERENT name is fine
    TxLog.addColumns(t, org.apache.spark.sql.types.StructType.fromDDL("x2 DOUBLE"))
    assert(TxLog.schemaOf(t).get.fieldNames.contains("x2"))
  }

  test("dropping a RENAMEd column clears its mapping; fresh re-use of the logical name is safe") {
    import spark.implicits._
    val t = freshTable(); seed(t)
    TxLog.renameColumn(t, "x", "score") // physical stays "x"
    assert(TxLog.renameMap(t) == Map("score" -> "x"))
    TxLog.dropColumn(t, "score")
    assert(TxLog.renameMap(t).isEmpty, "mapping must die with the column")
    assert(TxLog.droppedPhysicalOf(t) == Set("x"), "tombstone is the PHYSICAL name")
    // "score" never existed physically — a fresh column under that name
    // cannot resurrect anything; "x" (the physical) stays refused
    TxLog.addColumns(t, org.apache.spark.sql.types.StructType.fromDDL("score DOUBLE"))
    val fresh = TxLog.read(spark, t)
    assert(fresh.columns.contains("score"))
    assert(fresh.select(col("score")).collect().forall(_.isNullAt(0)),
      "fresh column must read null, not the dropped column's bytes")
    intercept[IllegalArgumentException] {
      TxLog.addColumns(t, org.apache.spark.sql.types.StructType.fromDDL("x DOUBLE"))
    }
  }

  test("RESTORE to a pre-drop version resurrects the column and its data") {
    val t = freshTable(); seed(t)
    val vDrop = TxLog.dropColumn(t, "x")
    TxLog.restore(t, vDrop - 1)
    val back = TxLog.read(spark, t)
    assert(back.columns.contains("x"), "restore must re-declare the column")
    assert(back.select(sum(col("x"))).collect()(0).getDouble(0) == 30.0)
  }

  test("refusals: partition, last column, constraint, bloom, generated, missing") {
    import spark.implicits._
    val t = freshTable()
    TxLog.append(spark, t,
      Seq((1L, "a", 10.0)).toDF("id", "s", "x").coalesce(1),
      partitionBy = Seq("s"))
    intercept[IllegalArgumentException] { TxLog.dropColumn(t, "s") }
    intercept[IllegalArgumentException] { TxLog.dropColumn(t, "nope") }
    TxLog.addConstraint(spark, t, "x_pos", "x >= 0")
    val e = intercept[IllegalArgumentException] { TxLog.dropColumn(t, "x") }
    assert(e.getMessage.contains("x_pos"))
    TxLog.dropConstraint(t, "x_pos")
    TxLog.setBloomColumns(t, Seq("x"))
    intercept[IllegalArgumentException] { TxLog.dropColumn(t, "x") }
    TxLog.setBloomColumns(t, Nil)
    TxLog.dropColumn(t, "x") // now legal
    TxLog.dropColumn(t, "id") // leaves only the partition column
    intercept[IllegalArgumentException] { TxLog.dropColumn(t, "s") } // partition + last
  }

  test("SQL surface: ALTER TABLE '<path>' DROP COLUMN lands the commit") {
    val t = freshTable(); seed(t)
    graft.sources.TxLogSqlDml.install(spark)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
      graft.sources.GraftSqlParser.maintenance(
        s"ALTER TABLE '$t' DROP COLUMN x").get).collect()
    assert(TxLog.schemaOf(t).get.fieldNames.toSeq == Seq("id", "s"))
    assert(TxLog.history(t).exists(_.operation == "DROP COLUMN"))
  }
}
