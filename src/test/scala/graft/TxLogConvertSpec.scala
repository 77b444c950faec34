package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** CONVERT TO TXLOG (metadata-only adoption of a plain parquet dir) and
  * DYNAMIC partition overwrite — the two round-13 write-side additions
  * on top of PARTITIONED BY. */
class TxLogConvertSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-convert-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-conv").resolve("t").toString

  test("convert adopts files in place: same bytes, stats skipping, log semantics") {
    import spark.implicits._
    val t = tmp()
    // a plain parquet directory written by stock Spark (4 files)
    spark.range(0, 100).select(col("id"), (col("id") % 10).as("bucket"))
      .repartitionByRange(4, col("id")).write.parquet(t)
    val beforeFiles = Files.walk(java.nio.file.Paths.get(t)).iterator()
    val before = {
      import scala.jdk.CollectionConverters._
      beforeFiles.asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet"))
        .map(p => p -> Files.getLastModifiedTime(p)).toMap
    }
    TxLog.convert(spark, t)
    assert(TxLog.versions(t) == Seq(1L))
    // not a byte rewritten: same files, same mtimes
    before.foreach { case (p, mt) =>
      assert(Files.getLastModifiedTime(p) == mt, s"$p was rewritten")
    }
    assert(TxLog.snapshotAdds(t).size == 4)
    // schema declared; reads + stats skipping live immediately
    assert(TxLog.schemaOf(t).map(_.fieldNames.toSeq) ==
      Some(Seq("id", "bucket")))
    assert(TxLog.read(spark, t).count() == 100L)
    val pr = TxLog.prune(spark, t, col("id") < 10L)
    assert(pr.kept.size == 1 && pr.skipped.size == 3) // range-laid files skip
    // the adopted table is a full citizen: append + time travel work
    TxLog.append(spark, t, Seq((1000L, 0L)).toDF("id", "bucket"))
    assert(TxLog.read(spark, t).count() == 101L)
    assert(TxLog.read(spark, t, asOf = Some(1L)).count() == 100L)
    // double convert refused
    intercept[IllegalArgumentException] { TxLog.convert(spark, t) }
  }

  test("convert refuses hive-partitioned layouts loudly") {
    val t = tmp()
    spark.range(0, 10).select(col("id"), (col("id") % 2).as("p"))
      .write.partitionBy("p").parquet(t)
    val e = intercept[IllegalArgumentException] { TxLog.convert(spark, t) }
    assert(e.getMessage.contains("hive-partitioned"))
  }

  test("dynamic partition overwrite replaces exactly the incoming partitions") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "en"), (2L, "fr"), (3L, "de")).toDF("id", "lang"),
      partitionBy = Seq("lang"))
    val frFile = TxLog.snapshotAdds(t).filter(a =>
      TxLog.decodePartValues(a.part.get).head._2.contains("fr"))
      .map(_.path).toSet
    // incoming touches en + de only — fr must survive bit-identical
    TxLog.overwritePartitions(spark, t,
      Seq((10L, "en"), (11L, "de"), (12L, "de")).toDF("id", "lang"))
    val after = TxLog.snapshotAdds(t).map(_.path).toSet
    assert(frFile.subsetOf(after))
    val got = TxLog.read(spark, t).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 10L, 11L, 12L))
    // unpartitioned table refused
    val t2 = tmp()
    TxLog.append(spark, t2, Seq(1L).toDF("id"))
    intercept[IllegalArgumentException] {
      TxLog.overwritePartitions(spark, t2, Seq(2L).toDF("id"))
    }
  }

  test("dynamic overwrite races: an append into an untouched partition survives") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "en"), (2L, "fr")).toDF("id", "lang"),
      partitionBy = Seq("lang"))
    // sequential stand-in for the race: the rebase loop recomputes the
    // remove set per attempt, so a commit landing between stage and CAS
    // is handled identically — here we just interleave
    TxLog.append(spark, t, Seq((3L, "de")).toDF("id", "lang"))
    TxLog.overwritePartitions(spark, t, Seq((10L, "en")).toDF("id", "lang"))
    val got = TxLog.read(spark, t).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 10L))
  }
}
