package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog
import graft.etl.TxLog.MergeClause

/** Round 15: non-equality MERGE ON predicates (VERDICT r14 #3) and
  * explicit-clause MERGE schema evolution (VERDICT r14 #2). */
class Round15MergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round15-merge", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-r15m").resolve("t").toString

  private def rows(t: String): Seq[(Long, String, Long)] =
    TxLog.read(spark, t).select(col("id"), col("s"), col("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._1, r._3)).toSeq

  private def seed(t: String): Unit = {
    import spark.implicits._
    TxLog.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
        .toDF("id", "s", "n").coalesce(2))
  }

  // ------------------------------ VERDICT r14 #3: residual ON predicate

  test("mergeClauses residual: a residual-failing row inserts, not updates") {
    import spark.implicits._
    val t = tmp(); seed(t)
    // keys 1 and 3 both key-match; residual t.n < 25 admits only id=1.
    // id=3 is then "not matched" BOTH ways: target row 3 falls to the BY
    // SOURCE clause, source row 3 INSERTS (standard SQL MERGE).
    TxLog.mergeClauses(spark, t,
      Seq((1L, 100L), (3L, 300L)).toDF("id", "delta"), Seq("id"),
      matched = Seq(MergeClause("update", None,
        Map("n" -> expr("t.n + s.delta")))),
      notMatched = Seq(MergeClause("insert", None,
        Map("id" -> expr("s.id"), "s" -> lit("ins"), "n" -> expr("s.delta")))),
      notMatchedBySource = Seq(MergeClause("update", None,
        Map("s" -> expr("concat(t.s, '!')")))),
      residual = Some(expr("t.n < 25")))
    assert(rows(t) == Seq((1L, "a", 110L), (2L, "b!", 20L), (3L, "c!", 30L),
      (3L, "ins", 300L), (4L, "d!", 40L)))
  }

  test("SQL MERGE: range-guarded ON — key equality + residual") {
    import spark.implicits._
    val t = tmp(); seed(t)
    graft.sources.TxLogSqlDml.install(spark)
    val name = s"r15_on_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name (id BIGINT, s STRING, n BIGINT) USING " +
      s"graft.sources.TxLogSource OPTIONS (path '$t')")
    try {
      spark.sql(
        s"""MERGE INTO $name USING (
           |  SELECT 1L AS id, 5L AS delta UNION ALL SELECT 2L, 7L) src
           |ON $name.id = src.id AND $name.n < 15
           |WHEN MATCHED THEN UPDATE SET n = $name.n + src.delta
           |WHEN NOT MATCHED THEN INSERT (id, s, n)
           |  VALUES (src.id, 'ins', src.delta)""".stripMargin)
      // id=1 (n=10<15): updated. id=2 (n=20): residual fails -> the
      // source row INSERTS alongside the untouched target row.
      assert(rows(t) == Seq((1L, "a", 15L), (2L, "ins", 7L), (2L, "b", 20L),
        (3L, "c", 30L), (4L, "d", 40L)))
      // a pure-theta ON (no key equality) is refused loudly
      val e = intercept[Exception] {
        spark.sql(s"MERGE INTO $name USING (SELECT 1L AS id, 0L AS delta) " +
          s"src ON $name.n < src.delta " +
          "WHEN MATCHED THEN UPDATE SET n = src.delta")
      }
      assert(e.getMessage.contains("key equality"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  // --------------------- VERDICT r14 #2: clause-form schema evolution

  test("mergeClauses mergeSchema: assigned new columns widen the declaration") {
    import spark.implicits._
    val t = tmp(); seed(t)
    val v0 = TxLog.versions(t).last
    val v = TxLog.mergeClauses(spark, t,
      Seq((1L, 7L), (9L, 9L)).toDF("id", "score"), Seq("id"),
      matched = Seq(MergeClause("update", None,
        Map("rank" -> expr("s.score * 10L")))),
      notMatched = Seq(MergeClause("insert", None,
        Map("id" -> expr("s.id"), "s" -> lit("i"), "n" -> lit(0L),
          "rank" -> expr("s.score")))),
      mergeSchema = true)
    assert(v.isDefined)
    // declaration widened IN the merge commit
    val sch = TxLog.schemaOf(t).get
    assert(sch.fieldNames.toSeq == Seq("id", "s", "n", "rank"))
    assert(TxLog.schemaOf(t, Some(v0)).get.fieldNames.length == 3,
      "pre-merge declaration must stay narrow (schema is versioned)")
    val got = TxLog.read(spark, t)
      .select(col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    // 1 updated -> 70; 2,3,4 untouched (files not rewritten) -> null;
    // 9 inserted -> 9
    assert(got == Seq((1L, 70L), (2L, -1L), (3L, -1L), (4L, -1L), (9L, 9L)))
  }

  test("mergeClauses without mergeSchema refuses a new column, naming the flag") {
    import spark.implicits._
    val t = tmp(); seed(t)
    val e = intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, t, Seq((1L, 7L)).toDF("id", "score"),
        Seq("id"),
        matched = Seq(MergeClause("update", None,
          Map("rank" -> expr("s.score")))),
        notMatched = Nil)
    }
    assert(e.getMessage.contains("mergeSchema") &&
      e.getMessage.contains("SCHEMA EVOLUTION"), e.getMessage)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION: explicit clauses over the catalog") {
    import spark.implicits._
    val t = tmp(); seed(t)
    graft.sources.TxLogSqlDml.install(spark)
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    // the analyzer evolves SOURCE-named columns through the catalog (the
    // Delta autoMerge shape: `rank` exists on the source, not the target)
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$t` tgt USING (
         |  SELECT 1L AS id, 70L AS rank UNION ALL
         |  SELECT 9L AS id, 9L AS rank) src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET rank = src.rank
         |WHEN NOT MATCHED THEN INSERT (id, s, n, rank)
         |  VALUES (src.id, 'i', 0L, src.rank)""".stripMargin)
    assert(TxLog.schemaOf(t).get.fieldNames.contains("rank"))
    val got = TxLog.read(spark, t).select(col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 70L), (2L, -1L), (3L, -1L), (4L, -1L), (9L, 9L)))
  }

  test("clause evolution composes with CDF: record null-fills the pre side") {
    import spark.implicits._
    val t = tmp(); seed(t)
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    TxLog.mergeClauses(spark, t,
      Seq((1L, 7L)).toDF("id", "score"), Seq("id"),
      matched = Seq(MergeClause("update", None,
        Map("rank" -> expr("s.score")))),
      notMatched = Nil, mergeSchema = true)
    val feed = TxLog.changeFeed(spark, t, v0)
    val got = feed.select(col(TxLog.ChangeTypeCol), col("id"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
    assert(got == Seq(("update_postimage", 1L, 7L),
      ("update_preimage", 1L, -1L)), s"got $got")
  }
}
