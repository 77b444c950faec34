package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** GENERATED ALWAYS AS columns for TxLog (round-13): declared on an
  * empty table, materialized for writers that omit them, validated for
  * writers that supply them — and usable as partition columns, the
  * production idiom (partition by a derived date without trusting every
  * writer to compute it). */
class TxLogGeneratedSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-gen-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-gen").resolve("t").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType),
    StructField("day", DateType)))

  private def rows(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, Timestamp.valueOf(s"2024-01-0${(i % 3) + 1} 10:00:00")))
      .toDF("id", "ts")
  }

  test("materialize on omit, validate on supply, refuse lies") {
    val t = tmp()
    TxLog.create(t, schema)
    TxLog.addGeneratedColumn(spark, t, "day", "CAST(ts AS DATE)")
    // writer omits day → materialized
    TxLog.append(spark, t, rows(Seq(1L, 2L, 3L)))
    val got = TxLog.read(spark, t)
      .select(col("id"), col("day").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "2024-01-02", 2L -> "2024-01-03",
      3L -> "2024-01-01"))
    // writer supplies the CORRECT value → accepted
    TxLog.append(spark, t,
      rows(Seq(4L)).withColumn("day", expr("CAST(ts AS DATE)")))
    assert(TxLog.read(spark, t).count() == 4L)
    // writer supplies a LYING value → whole write bounces, nothing lands
    val before = TxLog.versions(t).size
    intercept[IllegalArgumentException] {
      TxLog.append(spark, t,
        rows(Seq(5L)).withColumn("day", lit("1999-12-31").cast("date")))
    }
    assert(TxLog.versions(t).size == before)
  }

  test("declaration guards: non-empty table, unknown column, type mismatch") {
    import spark.implicits._
    val t = tmp()
    TxLog.create(t, schema)
    TxLog.append(spark, t, rows(Seq(1L)))
    intercept[IllegalArgumentException] {
      TxLog.addGeneratedColumn(spark, t, "day", "CAST(ts AS DATE)")
    }
    val t2 = tmp()
    TxLog.create(t2, schema)
    intercept[IllegalArgumentException] {
      TxLog.addGeneratedColumn(spark, t2, "nope", "CAST(ts AS DATE)")
    }
    // declared DATE but expression yields STRING
    intercept[IllegalArgumentException] {
      TxLog.addGeneratedColumn(spark, t2, "day", "date_format(ts, 'yyyy-MM-dd')")
    }
    // chained generation: expression referencing another generated column
    TxLog.addGeneratedColumn(spark, t2, "day", "CAST(ts AS DATE)")
    val t3 = tmp()
    TxLog.create(t3, StructType(schema.fields :+ StructField("day2", DateType)))
    TxLog.addGeneratedColumn(spark, t3, "day", "CAST(ts AS DATE)")
    intercept[Exception] {
      TxLog.addGeneratedColumn(spark, t3, "day2", "day") // refers to a gencol
    }
  }

  test("generated column as partition column: materialize then prune") {
    val t = tmp()
    TxLog.create(t, schema, partitionBy = Seq("day"))
    TxLog.addGeneratedColumn(spark, t, "day", "CAST(ts AS DATE)")
    TxLog.append(spark, t, rows(Seq(1L, 2L, 3L, 4L, 5L, 6L)).coalesce(1))
    // one file per derived day, each carrying its tuple
    val adds = TxLog.snapshotAdds(t)
    assert(adds.size == 3 && adds.forall(_.part.isDefined))
    val pr = TxLog.prune(spark, t, col("day") === "2024-01-02")
    assert(pr.kept.size == 1 && pr.skipped.size == 2)
    assert(TxLog.readWhere(spark, t, col("day") === "2024-01-02")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L))
  }

  test("UPDATE recomputes generated columns; MERGE validates them (round 14)") {
    import spark.implicits._
    val t = tmp()
    TxLog.create(t, schema)
    TxLog.addGeneratedColumn(spark, t, "day", "CAST(ts AS DATE)")
    TxLog.append(spark, t, rows(Seq(1L, 2L)))
    // updating the BASE column regenerates the stored derived value —
    // previously the stale pre-update day survived the rewrite
    TxLog.updateWhere(spark, t, col("id") === 1L,
      Map("ts" -> lit(Timestamp.valueOf("2024-02-09 10:00:00"))))
    val got = TxLog.read(spark, t)
      .select(col("id"), col("day").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "2024-02-09", s"generated column must regenerate, got $got")
    // assigning the generated column directly refuses
    intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, t, col("id") === 1L,
        Map("day" -> lit("1999-12-31").cast("date")))
    }
    // MERGE: an omitted generated column materializes; a lying one bounces
    TxLog.merge(spark, t, rows(Seq(2L, 9L)), Seq("id"))
    val after = TxLog.read(spark, t)
      .select(col("id"), col("day").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(9L) == "2024-01-01" && after.size == 3) // ts = 01-0{(9%3)+1}
    intercept[IllegalArgumentException] {
      TxLog.merge(spark, t,
        rows(Seq(7L)).withColumn("day", lit("1999-12-31").cast("date")),
        Seq("id"))
    }
  }
}
