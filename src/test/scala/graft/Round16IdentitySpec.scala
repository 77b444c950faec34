package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog
import graft.etl.TxLog.MergeClause

/** Round 16 (ADVICE r15 #1/#2): IDENTITY columns cover EVERY writer verb
  * — merge / mergeClauses / replaceWhere / overwritePartitions assign
  * omitted ids and advance the watermark like append; RENAME/DROP/UPDATE
  * of an identity column refuse loudly (no re-key verb exists in the
  * format). */
class Round16IdentitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round16-identity", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-r16i").resolve("t").toString

  private def mk(t: String, allowExplicit: Boolean = false,
                 extra: String = "k BIGINT, s STRING"): Unit = {
    TxLog.create(t, org.apache.spark.sql.types.StructType.fromDDL(
      s"id BIGINT, $extra"))
    TxLog.addIdentityColumn(t, "id", 1L, 1L, allowExplicit)
  }

  private def idByK(t: String): Map[Long, Long] =
    TxLog.read(spark, t).select(col("k"), col("id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("merge: matched rows keep their id, inserted rows draw fresh past the watermark") {
    import spark.implicits._
    val t = tmp(); mk(t)
    TxLog.append(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s").coalesce(2))
    val before = idByK(t)
    val wm = TxLog.identityWatermark(t, "id").get
    // upsert: k=2 updated (id must survive), k=9/k=10 inserted (fresh ids)
    TxLog.merge(spark, t,
      Seq((2L, "B"), (9L, "i"), (10L, "j")).toDF("k", "s"), Seq("k"))
    val after = idByK(t)
    assert(after(1L) == before(1L) && after(3L) == before(3L),
      "survivor ids must be untouched")
    assert(after(2L) == before(2L),
      s"matched row must INHERIT its id: ${after(2L)} vs ${before(2L)}")
    assert(after(9L) > wm && after(10L) > wm && after(9L) != after(10L),
      s"inserted ids must be fresh past watermark $wm: $after")
    assert(after.values.toSeq.distinct.size == 5, s"ids must be unique: $after")
    assert(TxLog.identityWatermark(t, "id").get >= after.values.max)
    // a second merge keeps going monotone
    TxLog.merge(spark, t, Seq((11L, "x")).toDF("k", "s"), Seq("k"))
    val third = idByK(t)
    assert(third(11L) > after.values.max, s"monotone: $third")
  }

  test("merge: empty table degenerates to assigned append; ALWAYS supply refuses") {
    import spark.implicits._
    val t = tmp(); mk(t)
    TxLog.merge(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s"), Seq("k"))
    val got = idByK(t)
    assert(got.values.toSeq.distinct.size == 2 && got.values.min >= 1L)
    val e = intercept[IllegalArgumentException] {
      TxLog.merge(spark, t,
        Seq((99L, 3L, "x")).toDF("id", "k", "s"), Seq("k"))
    }
    assert(e.getMessage.contains("ALWAYS"), e.getMessage)
    // an identity column as the MERGE KEY with no supplied values refuses
    val e2 = intercept[IllegalArgumentException] {
      TxLog.merge(spark, t, Seq(("x", 5L)).toDF("s", "k"), Seq("id"))
    }
    assert(e2.getMessage.contains("identity key"), e2.getMessage)
  }

  test("merge BY DEFAULT: explicit ids pass through and advance the watermark") {
    import spark.implicits._
    val t = tmp(); mk(t, allowExplicit = true)
    TxLog.append(spark, t, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    TxLog.merge(spark, t,
      Seq((700L, 2L, "b")).toDF("id", "k", "s"), Seq("k"))
    assert(idByK(t)(2L) == 700L)
    assert(TxLog.identityWatermark(t, "id").get >= 700L)
    TxLog.append(spark, t, Seq((3L, "c")).toDF("k", "s").coalesce(1))
    assert(idByK(t)(3L) > 700L, "later assignment must clear the explicit max")
  }

  test("merge + CDF: cdc insert ids match the committed data ids (pinned assignment)") {
    import spark.implicits._
    val t = tmp(); mk(t)
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    TxLog.merge(spark, t, Seq((2L, "B"), (9L, "i")).toDF("k", "s"), Seq("k"))
    val feed = TxLog.changeFeed(spark, t, v0)
    val cdcIns = feed.filter(col(TxLog.ChangeTypeCol) === "insert")
      .select(col("k"), col("id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val data = idByK(t)
    assert(cdcIns == Map(9L -> data(9L)),
      s"cdc insert ids must equal committed ids: $cdcIns vs $data")
    val cdcPost = feed.filter(col(TxLog.ChangeTypeCol) === "update_postimage")
      .select(col("k"), col("id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cdcPost == Map(2L -> data(2L)),
      s"cdc post-image must carry the inherited id: $cdcPost")
  }

  test("mergeClauses: insert clauses assign fresh ids; UPDATE of identity refuses") {
    import spark.implicits._
    val t = tmp(); mk(t)
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    val before = idByK(t)
    val wm = TxLog.identityWatermark(t, "id").get
    TxLog.mergeClauses(spark, t,
      Seq((1L, "A"), (9L, "i")).toDF("k", "s2"), Seq("k"),
      matched = Seq(MergeClause("update", None, Map("s" -> expr("s.s2")))),
      notMatched = Seq(MergeClause("insert", None,
        Map("k" -> expr("s.k"), "s" -> expr("s.s2")))))
    val after = idByK(t)
    assert(after(1L) == before(1L), "updated row keeps its id")
    assert(after(9L) > wm, s"insert-clause row must draw a fresh id: $after")
    assert(after.values.toSeq.distinct.size == 3)
    assert(TxLog.identityWatermark(t, "id").get >= after.values.max)
    val e = intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, t, Seq((1L, 50L)).toDF("k", "v"), Seq("k"),
        matched = Seq(MergeClause("update", None, Map("id" -> expr("s.v")))),
        notMatched = Nil)
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
    // ALWAYS: insert clause assigning the identity column refuses
    val e2 = intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, t, Seq((99L, 7L)).toDF("v", "k"), Seq("k"),
        matched = Nil,
        notMatched = Seq(MergeClause("insert", None,
          Map("id" -> expr("s.v"), "k" -> expr("s.k")))))
    }
    assert(e2.getMessage.contains("ALWAYS"), e2.getMessage)
  }

  test("mergeClauses BY DEFAULT + CDF: explicit and assigned ids both exact in the feed") {
    import spark.implicits._
    val t = tmp(); mk(t, allowExplicit = true)
    TxLog.append(spark, t, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    TxLog.setProperties(t, Map(TxLog.CdfProperty -> "true"))
    val v0 = TxLog.versions(t).last
    TxLog.mergeClauses(spark, t,
      Seq((1L, "A"), (8L, "h"), (9L, "i")).toDF("k", "s2"), Seq("k"),
      matched = Seq(MergeClause("update", None, Map("s" -> expr("s.s2")))),
      notMatched = Seq(
        MergeClause("insert", Some(expr("s.k = 8")),
          Map("id" -> lit(800L), "k" -> expr("s.k"), "s" -> expr("s.s2"))),
        MergeClause("insert", None,
          Map("k" -> expr("s.k"), "s" -> expr("s.s2")))))
    val data = idByK(t)
    assert(data(8L) == 800L, s"explicit clause id must store: $data")
    assert(data(9L) != 800L && data.values.toSeq.distinct.size == 3)
    assert(TxLog.identityWatermark(t, "id").get >= 800L,
      "explicit insert-clause id must advance the watermark")
    val cdcIns = TxLog.changeFeed(spark, t, v0)
      .filter(col(TxLog.ChangeTypeCol) === "insert")
      .select(col("k"), col("id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cdcIns == Map(8L -> data(8L), 9L -> data(9L)),
      s"cdc ids must equal committed ids: $cdcIns vs $data")
  }

  test("replaceWhere and overwritePartitions assign and stay monotone") {
    import spark.implicits._
    val t = tmp(); mk(t, extra = "k BIGINT, s STRING, p STRING")
    TxLog.append(spark, t,
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "s", "p").coalesce(1),
      partitionBy = Seq("p"))
    val before = idByK(t)
    val wm = TxLog.identityWatermark(t, "id").get
    TxLog.replaceWhere(spark, t,
      Seq((3L, "c", "x"), (4L, "d", "x")).toDF("k", "s", "p").coalesce(1),
      col("p") === "x")
    val afterRw = idByK(t)
    assert(afterRw(2L) == before(2L), "untouched partition keeps its ids")
    assert(afterRw(3L) > wm && afterRw(4L) > wm && afterRw(3L) != afterRw(4L),
      s"replaceWhere rows must draw fresh ids: $afterRw")
    val wm2 = TxLog.identityWatermark(t, "id").get
    assert(wm2 >= afterRw.values.max)
    TxLog.overwritePartitions(spark, t,
      Seq((5L, "e", "y")).toDF("k", "s", "p").coalesce(1))
    val afterOp = idByK(t)
    assert(afterOp(5L) > wm2, s"overwritePartitions must continue: $afterOp")
    assert(afterOp.values.toSeq.distinct.size == afterOp.size)
  }

  test("RENAME/DROP/UPDATE of an identity column refuse loudly") {
    import spark.implicits._
    val t = tmp(); mk(t)
    TxLog.append(spark, t, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    val e1 = intercept[IllegalArgumentException] {
      TxLog.renameColumn(t, "id", "id2")
    }
    assert(e1.getMessage.contains("IDENTITY"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TxLog.dropColumn(t, "id")
    }
    assert(e2.getMessage.contains("IDENTITY"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, t, col("k") === 1L, Map("id" -> lit(99L)))
    }
    assert(e3.getMessage.contains("IDENTITY"), e3.getMessage)
    // non-identity DDL on the same table still works
    TxLog.renameColumn(t, "s", "s2")
    assert(TxLog.schemaOf(t).get.fieldNames.contains("s2"))
  }

  test("CREATE with a bad declaration fails BEFORE publishing — retry works") {
    import spark.implicits._
    val t = tmp()
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    // IDENTITY on a non-BIGINT column must refuse without creating the log
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$t` (" +
        "id INT GENERATED ALWAYS AS IDENTITY, s STRING)")
    }
    assert(TxLog.versions(t).isEmpty,
      "a refused CREATE must not leave a half-created table")
    // a non-constant DEFAULT refuses the same way
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$t` (a BIGINT, b BIGINT DEFAULT a + 1)")
    }
    assert(TxLog.versions(t).isEmpty)
    // the corrected CREATE then succeeds (no TableAlreadyExistsException)
    spark.sql(s"CREATE TABLE graft.`$t` (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, s STRING)")
    TxLog.append(spark, t, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    assert(idByK(t).size == 1)
  }

  test("SQL INSERT omitting the identity column assigns (analyzer null-fill)") {
    import spark.implicits._
    val t = tmp()
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.sql(s"CREATE TABLE graft.`$t` (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO graft.`$t` (k, s) VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO graft.`$t` (k, s) VALUES (3, 'c')")
    val got = idByK(t)
    assert(got.size == 3 && got.values.toSeq.distinct.size == 3,
      s"SQL INSERT must assign unique ids: $got")
    assert(TxLog.identityWatermark(t, "id").contains(got.values.max))
  }
}
