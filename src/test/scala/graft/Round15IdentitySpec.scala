package graft

import java.nio.file.Files
import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** Round 15: GENERATED { ALWAYS | BY DEFAULT } AS IDENTITY — monotone
  * unique assignment with per-commit watermark OCC; gaps allowed (the
  * production-identity contract). */
class Round15IdentitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round15-identity", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-r15i").resolve("t").toString

  private def ids(t: String): Seq[Long] =
    TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq

  private def mk(t: String, allowExplicit: Boolean = false,
                 start: Long = 1L, step: Long = 1L): Unit = {
    TxLog.create(t, org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, s STRING"))
    TxLog.addIdentityColumn(t, "id", start, step, allowExplicit)
  }

  test("assignment: unique, step-aligned, monotone across commits") {
    import spark.implicits._
    val t = tmp(); mk(t, start = 100L, step = 10L)
    TxLog.append(spark, t,
      Seq("a", "b", "c").toDF("s").coalesce(2))
    val first = ids(t)
    assert(first.size == 3 && first.distinct.size == 3)
    assert(first.min == 100L) // partition 0, row 0 = START
    assert(first.forall(v => (v - 100L) % 10L == 0), s"alignment: $first")
    // second append: strictly beyond the first commit's watermark
    TxLog.append(spark, t, Seq("d", "e").toDF("s").coalesce(1))
    val all = ids(t)
    assert(all.size == 5 && all.distinct.size == 5)
    assert(all.filterNot(first.contains).forall(_ > first.max),
      s"second-commit ids must pass the watermark: $all vs $first")
    assert(TxLog.identityWatermark(t, "id").contains(all.max))
  }

  test("ALWAYS refuses explicit supply; BY DEFAULT accepts and advances") {
    import spark.implicits._
    val t = tmp(); mk(t)
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((5L, "x")).toDF("id", "s").coalesce(1))
    }
    assert(e.getMessage.contains("ALWAYS"), e.getMessage)
    val t2 = tmp(); mk(t2, allowExplicit = true)
    TxLog.append(spark, t2, Seq((500L, "x")).toDF("id", "s").coalesce(1))
    // the watermark advanced past the supplied value: the next
    // assignment cannot collide
    TxLog.append(spark, t2, Seq("y").toDF("s").coalesce(1))
    val got = ids(t2)
    assert(got.head == 500L && got(1) > 500L, s"got $got")
    // an ALL-NULL supplied column is OMITTED (round-16, ADVICE r15 #3:
    // SQL INSERT's analyzer null-fill must assign, not refuse) …
    TxLog.append(spark, t2,
      Seq((null.asInstanceOf[java.lang.Long], "z"))
        .toDF("id", "s").coalesce(1))
    val after = ids(t2)
    assert(after.size == 3 && after.distinct.size == 3 &&
      after.max > 500L, s"all-null supply must assign: $after")
    // … while a MIXED null/non-null supply still refuses loudly
    intercept[IllegalArgumentException] {
      TxLog.append(spark, t2,
        Seq((java.lang.Long.valueOf(9000L), "p"),
            (null.asInstanceOf[java.lang.Long], "q"))
          .toDF("id", "s").coalesce(1))
    }
  }

  test("declaration rules: empty table, BIGINT, no generated/default overlap") {
    import spark.implicits._
    val t = tmp()
    TxLog.create(t, org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, n INT, s STRING"))
    intercept[IllegalArgumentException] {
      TxLog.addIdentityColumn(t, "n") // not BIGINT
    }
    TxLog.setColumnDefault(spark, t, "s", "'d'")
    intercept[IllegalArgumentException] {
      TxLog.addIdentityColumn(t, "s") // carries a default (and not BIGINT)
    }
    TxLog.addIdentityColumn(t, "id")
    intercept[IllegalArgumentException] { TxLog.addIdentityColumn(t, "id") }
    TxLog.append(spark, t, Seq((1, "a")).toDF("n", "s").coalesce(1))
    val t2 = tmp()
    TxLog.create(t2, org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"))
    TxLog.append(spark, t2, Seq(Tuple1(1L)).toDF("id").coalesce(1))
    intercept[IllegalArgumentException] {
      TxLog.addIdentityColumn(t2, "id") // non-empty table
    }
  }

  test("racing appends: OCC restage keeps ids collision-free") {
    import spark.implicits._
    val t = tmp(); mk(t)
    val pool = Executors.newFixedThreadPool(4)
    val futures = (1 to 4).map { k =>
      pool.submit(new Runnable { def run(): Unit = {
        TxLog.append(spark, t,
          (1 to 5).map(i => s"w$k-$i").toDF("s").coalesce(2)); ()
      } })
    }
    futures.foreach(_.get(180, TimeUnit.SECONDS))
    pool.shutdown()
    val got = ids(t)
    assert(got.size == 20 && got.distinct.size == 20,
      s"identity collision under racing appends: $got")
  }

  test("identity continues across overwrite and exactly-once appends") {
    import spark.implicits._
    val t = tmp(); mk(t)
    TxLog.append(spark, t, Seq("a", "b").toDF("s").coalesce(1))
    val wmBefore = TxLog.identityWatermark(t, "id").get
    TxLog.overwrite(spark, t, Seq("c").toDF("s").coalesce(1))
    val got = ids(t)
    assert(got.size == 1 && got.head > wmBefore,
      s"overwrite must continue the sequence: $got vs wm $wmBefore")
    // appendOnce assigns too, and its replay skips without reassigning
    assert(TxLog.appendOnce(spark, t,
      Seq("d").toDF("s").coalesce(1), txn = "batch-1").isDefined)
    assert(TxLog.appendOnce(spark, t,
      Seq("d").toDF("s").coalesce(1), txn = "batch-1").isEmpty)
    assert(ids(t).size == 2 && ids(t).distinct.size == 2)
  }

  test("SQL: CREATE TABLE … GENERATED ALWAYS AS IDENTITY via the catalog") {
    import spark.implicits._
    val t = tmp()
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.sql(s"CREATE TABLE graft.`$t` (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 7 INCREMENT BY 3), " +
      "s STRING)")
    assert(TxLog.identityColsOf(t) == Map("id" -> (7L, 3L, false)))
    TxLog.append(spark, t, Seq("a", "b").toDF("s").coalesce(1))
    val got = ids(t)
    assert(got.min == 7L && got.forall(v => (v - 7L) % 3L == 0) &&
      got.distinct.size == 2, s"got $got")
  }
}
