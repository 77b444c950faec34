package graft

import java.nio.file.Files
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{Bucketing, GraftSession, Tables}

/** Bucketed tables make the fact⋈dim join shuffle-free. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val wh = Files.createTempDirectory("graft_bucket_wh").toString
    val s = GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("bucket-spec")
        .config("spark.sql.warehouse.dir", wh),
      shufflePartitions = 4).getOrCreate()
    // disable broadcast (static + adaptive) AFTER tune so the join strategy
    // is SMJ and the bucket-vs-shuffle difference is observable
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s
  }
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("bucketed fact join dim has no shuffle exchange; plain join does") {
    Bucketing.writeBucketed(Tables.lineitem(spark, sf), "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(Tables.orders(spark, sf), "ord_b", "o_orderkey", 4)

    val bucketed = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority")).count()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()

    // same answer
    assert(bucketed.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    // bucketed join itself introduces no shuffle before the aggregation;
    // the only exchange in the bucketed plan belongs to the groupBy
    val bucketedJoinOnly = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
    val plainJoinOnly = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.hasShuffle(bucketedJoinOnly), "bucketed join should be shuffle-free")
    assert(Bucketing.hasShuffle(plainJoinOnly), "plain SMJ should shuffle both sides")
  }
}
