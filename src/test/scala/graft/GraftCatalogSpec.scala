package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** [[graft.sources.GraftCatalog]]: stock Spark SQL time travel and DDL
  * over path-keyed TxLog tables — `VERSION AS OF` / `TIMESTAMP AS OF`
  * resolve through the public DSv2 catalog contract, no custom parser. */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = GraftSession.local("graft-catalog-spec", cores = 4)
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-cat").resolve("t").toString

  test("SELECT latest / VERSION AS OF / TIMESTAMP AS OF — native syntax") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"),
      commitTs = Some(1000L))
    TxLog.append(spark, t, Seq((2L, "b")).toDF("id", "s"),
      commitTs = Some(2000L))
    def ids(sql: String): Seq[Long] =
      spark.sql(sql).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(s"SELECT id FROM graft.`$t`") == Seq(1L, 2L))
    assert(ids(s"SELECT id FROM graft.`$t` VERSION AS OF 1") == Seq(1L))
    // epoch-millis 1500 falls between the two injected commit timestamps
    assert(ids(s"SELECT id FROM graft.`$t` TIMESTAMP AS OF " +
      "'1970-01-01 00:00:01.5'") == Seq(1L))
    assert(ids(s"SELECT id FROM graft.`$t` TIMESTAMP AS OF " +
      "'1970-01-01 00:00:02'") == Seq(1L, 2L))
    // out-of-range targets fail loudly
    intercept[Exception] {
      spark.sql(s"SELECT id FROM graft.`$t` VERSION AS OF 99").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT id FROM graft.`$t` TIMESTAMP AS OF " +
        "'1970-01-01 00:00:00.5'").collect()
    }
  }

  test("CREATE TABLE declares schema + partitioning durably; INSERT/SELECT flow") {
    val t = tmp()
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    // declaration landed as version 1 BEFORE any insert
    assert(TxLog.versions(t) == Seq(1L))
    assert(TxLog.schemaOf(t).map(_.fieldNames.toSeq) == Some(Seq("id", "lang")))
    assert(TxLog.partColsOf(t) == Seq("lang"))
    // a fresh table SELECTs zero rows with the declared columns
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq ==
      Seq("id", "lang"))
    assert(spark.sql(s"SELECT * FROM graft.`$t`").count() == 0L)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 'en'), (2, 'fr'), (3, 'en')")
    assert(TxLog.snapshotAdds(t).forall(_.part.isDefined))
    assert(spark.sql(s"SELECT id FROM graft.`$t` WHERE lang = 'fr'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // partition pruning through the catalog read path
    assert(TxLog.prune(spark, t, col("lang") === "fr").kept.size == 1)
    // CREATE on an existing table is refused
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$t` (x BIGINT)")
    }
  }

  test("schema-on-write enforced from the CREATE declaration") {
    import spark.implicits._
    val t = tmp()
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, s STRING)")
    // a direct API write with a conflicting type bounces off the
    // version-1 declaration — CREATE's contract is live immediately
    intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((1.5, "x")).toDF("id", "s"))
    }
    TxLog.append(spark, t, Seq((1L, "x")).toDF("id", "s"))
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`")
      .collect()(0).getLong(0) == 1L)
  }

  test("maintenance verbs accept graft-catalog identifiers (round 14)") {
    import spark.implicits._
    import org.apache.spark.sql.graft.GraftSqlBridge
    import graft.sources.GraftSqlParser
    val t = tmp()
    graft.sources.TxLogSqlDml.install(spark)
    TxLog.append(spark, t, Seq((1L, "p0"), (2L, "p1")).toDF("id", "part")
      .coalesce(1), partitionBy = Seq("part"))
    TxLog.setProperties(t, Map("tier" -> "gold"))
    // same planning seam the extensions parser routes through; the
    // identifier is the DSv2 catalog form, not a quoted path
    def run(sql: String) = GraftSqlBridge.ofRows(spark,
      GraftSqlParser.maintenance(sql).getOrElse(
        fail(s"statement not recognized: $sql"))).collect()
    val props = run(s"SHOW TBLPROPERTIES graft.`$t`")
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props == Map("tier" -> "gold"))
    val parts = run(s"SHOW PARTITIONS graft.`$t`")
      .map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("part=p0", "part=p1"))
    // the DML verbs compose with the same identifier form
    run(s"ALTER TABLE graft.`$t` SET TBLPROPERTIES ('owner'='ops')")
    assert(TxLog.propertiesOf(t) == Map("tier" -> "gold", "owner" -> "ops"))
    run(s"DESCRIBE HISTORY graft.`$t`")
    // an identifier under an UNREGISTERED catalog name is NOT intercepted
    assert(GraftSqlParser.maintenance(
      s"SHOW TBLPROPERTIES nosuch.`$t`").isEmpty)
  }

  test("catalog refuses what it cannot mean: DROP, RENAME, namespaces") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq(1L).toDF("id"))
    intercept[Exception] { spark.sql(s"DROP TABLE graft.`$t`") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` RENAME TO graft.`${t}2`")
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.ns.`$t`").collect()
    }
  }
}
