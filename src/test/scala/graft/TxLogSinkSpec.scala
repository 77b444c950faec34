package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** Native streaming sink (`writeStream.format(txlog)`) — round 13: the
  * no-boilerplate half of the streaming-ingest story (TxLogStream's
  * foreachBatch path is the other). Pins: content parity with the batch
  * write, one ACID commit per micro-batch, exactly-once under checkpoint
  * re-drain AND under raw addBatch replay, partitionBy pass-through,
  * append-only refusal, and that the round-trip (sink → readStream tail)
  * composes. */
class TxLogSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-sink-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** A 2-file parquet source dir streamed with maxFilesPerTrigger=1, so
    * the drain produces ≥2 micro-batches (multi-commit, not one). */
  private def sourceDir(): (String, Seq[(Long, String)]) = {
    val dir = tmp("graft-sink-src")
    import spark.implicits._
    val rows = (1L to 6L).map(i => (i, s"doc$i"))
    rows.grouped(3).zipWithIndex.foreach { case (g, i) =>
      g.toDF("id", "s").coalesce(1).write.parquet(s"$dir/part$i")
    }
    (dir, rows)
  }

  private def drain(src: String, table: String, checkpoint: String,
                    appId: Option[String] = None): Unit = {
    val stream = spark.readStream.schema("id BIGINT, s STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/part*")
    val w = stream.writeStream.format("graft.sources.TxLogSource")
      .option("path", table)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
    appId.foreach(a => w.option("txnAppId", a))
    w.start().awaitTermination()
  }

  test("sink drains to ACID commits; content ≡ source; one version per batch") {
    val (src, rows) = sourceDir()
    val table = tmp("graft-sink-t") + "/t"
    drain(src, table, tmp("graft-sink-ckpt"))
    val got = TxLog.read(spark, table).select(col("id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == rows, "sink content must equal the streamed source")
    val vs = TxLog.versions(table)
    assert(vs.size >= 2, s"maxFilesPerTrigger=1 over 2 files should commit ≥2 versions, got $vs")
    // every commit carries its exactly-once marker (<queryId>/<batchId>)
    vs.foreach { v =>
      val log = Files.readString(java.nio.file.Paths.get(table, "_graft_log",
        f"$v%020d.json"))
      assert(log.contains("\"op\":\"txn\""), s"version $v lacks a txn marker")
    }
  }

  test("re-drain over the SAME checkpoint adds zero rows (exactly-once)") {
    val (src, rows) = sourceDir()
    val table = tmp("graft-sink-t2") + "/t"
    val ckpt = tmp("graft-sink-ckpt2")
    drain(src, table, ckpt)
    val v1 = TxLog.versions(table).size
    drain(src, table, ckpt) // same checkpoint: nothing new to deliver
    assert(TxLog.read(spark, table).count() == rows.size,
      "re-drain must not duplicate rows")
    assert(TxLog.versions(table).size == v1, "re-drain must not add commits")
  }

  test("raw addBatch replay of a committed batch no-ops (crash between commit and checkpoint)") {
    val table = tmp("graft-sink-t3") + "/t"
    import spark.implicits._
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val sink = new graft.sources.TxLogSink(table, Some("spec-app"), Nil)
    sink.addBatch(0L, batch)
    assert(TxLog.versions(table) == Seq(1L))
    // the at-least-once replay Spark guarantees after a crash: same
    // batchId re-delivered — the marker makes it a no-op
    sink.addBatch(0L, batch)
    assert(TxLog.versions(table) == Seq(1L), "replayed batch must not re-commit")
    assert(TxLog.read(spark, table).count() == 2)
    sink.addBatch(1L, batch) // a NEW batch id commits normally
    assert(TxLog.versions(table) == Seq(1L, 2L))
    assert(TxLog.read(spark, table).count() == 4)
  }

  test("partitionBy threads into the commit's partition declaration; pruned read") {
    val (src, _) = sourceDir()
    val table = tmp("graft-sink-t4") + "/t"
    import spark.implicits._
    val stream = spark.readStream.schema("id BIGINT, s STRING")
      .parquet(s"$src/part*")
      .withColumn("bucket", (col("id") % 2).cast("long"))
    stream.writeStream.format("graft.sources.TxLogSource")
      .option("path", table)
      .option("checkpointLocation", tmp("graft-sink-ckpt4"))
      .partitionBy("bucket")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    assert(TxLog.partColsOf(table) == Seq("bucket"),
      "sink partitionBy must declare table partitioning")
    val evens = TxLog.read(spark, table).filter(col("bucket") === 0L)
    assert(evens.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 4L, 6L))
  }

  test("non-append output modes are refused loudly") {
    val (src, _) = sourceDir()
    val agg = spark.readStream.schema("id BIGINT, s STRING")
      .parquet(s"$src/part*")
      .groupBy(col("s")).count()
    val e = intercept[Exception] {
      agg.writeStream.format("graft.sources.TxLogSource")
        .outputMode("complete")
        .option("path", tmp("graft-sink-t5") + "/t")
        .option("checkpointLocation", tmp("graft-sink-ckpt5"))
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getMessage != null)
  }

  test("sink → readStream tail composes: the CDC consumer sees each sink commit once") {
    val (src, rows) = sourceDir()
    val table = tmp("graft-sink-t6") + "/t"
    drain(src, table, tmp("graft-sink-ckpt6"))
    val outDir = tmp("graft-sink-out6")
    spark.readStream.format("graft.sources.TxLogSource")
      .option("path", table).load()
      .writeStream.format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val tailed = spark.read.parquet(s"$outDir/data")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(tailed == rows.map(_._1), "tail must deliver each sink commit exactly once")
  }
}
