package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** TBLPROPERTIES (SET / UNSET / SHOW) and VACUUM DRY RUN (round 13):
  * the metadata tail of the Delta verb set. */
class TxLogPropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-props-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def freshTable(): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-props").resolve("t").toString
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s").coalesce(1))
    t
  }

  test("set / overwrite / unset properties; replay is latest-wins") {
    val t = freshTable()
    TxLog.setProperties(t, Map("owner" -> "graft", "tier" -> "gold"))
    assert(TxLog.propertiesOf(t) == Map("owner" -> "graft", "tier" -> "gold"))
    TxLog.setProperties(t, Map("tier" -> "silver")) // overwrite one
    TxLog.unsetProperties(t, Seq("owner", "never-set")) // absent key = no-op
    assert(TxLog.propertiesOf(t) == Map("tier" -> "silver"))
    // historical values time-travel with the log
    val vs = TxLog.versions(t)
    assert(TxLog.propertiesOf(t, Some(vs(1))) ==
      Map("owner" -> "graft", "tier" -> "gold"))
    // values round-trip arbitrary content (base64 in the log)
    TxLog.setProperties(t, Map("note" -> """comment, with "quotes" and ="""))
    assert(TxLog.propertiesOf(t)("note") == """comment, with "quotes" and =""")
  }

  test("SQL SET / UNSET / SHOW TBLPROPERTIES") {
    val t = freshTable()
    graft.sources.TxLogSqlDml.install(spark)
    def run(sql: String) = org.apache.spark.sql.graft.GraftSqlBridge.ofRows(
      spark, graft.sources.GraftSqlParser.maintenance(sql).get).collect()
    run(s"ALTER TABLE '$t' SET TBLPROPERTIES ('owner'='graft', 'tier'='gold')")
    run(s"ALTER TABLE '$t' UNSET TBLPROPERTIES ('tier')")
    val rows = run(s"SHOW TBLPROPERTIES '$t'")
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq("owner" -> "graft"))
    assert(TxLog.history(t).exists(_.operation == "SET TBLPROPERTIES"))
  }

  test("VACUUM DRY RUN lists exactly what the real vacuum then deletes — and deletes nothing") {
    import spark.implicits._
    val t = freshTable()
    TxLog.overwrite(spark, t, Seq((2L, "b")).toDF("id", "s").coalesce(1))
    TxLog.overwrite(spark, t, Seq((3L, "c")).toDF("id", "s").coalesce(1))
    // retain only the last version; age window 0 so candidates qualify
    val preview = TxLog.vacuum(t, retainVersions = 1, minAgeMillis = 0L,
      dryRun = true)
    assert(preview.nonEmpty, "two superseded files should be candidates")
    preview.foreach(rel => assert(Files.exists(Paths.get(t, rel)),
      s"dry run must not delete $rel"))
    val deleted = TxLog.vacuum(t, retainVersions = 1, minAgeMillis = 0L)
    assert(deleted.sorted == preview.sorted,
      "the real vacuum must delete exactly the previewed set")
    preview.foreach(rel => assert(!Files.exists(Paths.get(t, rel))))
    // SQL surface: the DRY RUN statement returns the path rows
    graft.sources.TxLogSqlDml.install(spark)
    val rows = org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
      graft.sources.GraftSqlParser.maintenance(
        s"VACUUM '$t' RETAIN 1 VERSIONS DRY RUN").get).collect()
    assert(rows.isEmpty, "nothing left to preview after the real vacuum")
  }
}
