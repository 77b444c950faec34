package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.streaming.CusumStream

/** Streaming CUSUM contract: the windowed prefix−runmin identity equals
  * the textbook max(0, ...) recursion on the same grid, a planted mean
  * shift raises exactly the upper alarm, and batch replay is idempotent. */
class CusumStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("cusum-stream-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  private def statsOf(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("batch_id", "n", "s")
  }

  test("prefix-runmin identity == driver-side max(0,...) recursion") {
    // means: 100, 90, 130, 130, 95 with n = 10 each
    val rows = Seq((0L, 10L, 1000L), (1L, 10L, 900L), (2L, 10L, 1300L),
      (3L, 10L, 1300L), (4L, 10L, 950L))
    val got = CusumStream.cusumTrajectory(statsOf(rows), mu0 = 100.0, slack = 5.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap

    // reference recursion on the same 1e6 grid
    var su = 0L; var sd = 0L
    val want = rows.map { case (b, n, s) =>
      val du = math.floor((s.toDouble - 105.0 * n.toDouble) * 1e6).toLong
      val dd = math.floor((95.0 * n.toDouble - s.toDouble) * 1e6).toLong
      su = math.max(0L, su + du); sd = math.max(0L, sd + dd)
      b -> ((su / 1e6, sd / 1e6))
    }.toMap
    assert(got == want)
  }

  test("planted upward mean shift fires alarm_up only, after the shift") {
    val rows = (0L to 4L).map(b => (b, 20L, 2000L)) ++ // mean 100
      (5L to 9L).map(b => (b, 20L, 2700L)) // mean 135
    val got = CusumStream
      .cusumTrajectory(statsOf(rows), mu0 = 100.0, slack = 5.0, h = 500.0)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(5), r.getBoolean(6)))
      .toMap
    assert((0L to 4L).forall(b => !got(b)._1), "no alarm before the shift")
    assert(got(9L)._1, "cumulated 30/obs drift crosses h after the shift")
    assert((0L to 9L).forall(b => !got(b)._2), "downward side stays quiet")
  }

  test("per-batch stats merge to the one-shot stats; replay idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cusum").toFile.getAbsolutePath
    val (input, stats, cp) = (s"$root/in", s"$root/st", s"$root/cp")

    val docs = (1L to 100L).map(i => (i, "t", "en", "s", 50L + (i % 7)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.filter(col("doc_id") <= 50).write.parquet(input)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(input)
      CusumStream.cusumStream(spark, stream, stats, cp).awaitTermination()
    }
    runOnce()
    docs.filter(col("doc_id") > 50).write.mode("append").parquet(input)
    runOnce()
    runOnce() // replay with nothing new: must not add or change batches

    val series = CusumStream.batchSeries(spark, stats)
    assert(series.count() == 2, "two micro-batches, one stats row each")
    val merged = series.agg(sum(col("n")), sum(col("s"))).head()
    val oneShot = CusumStream.batchStats(docs).head()
    assert(merged.getLong(0) == oneShot.getLong(0))
    assert(merged.getLong(1) == oneShot.getLong(1))
  }
}
