package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Analytics, Datasets}

/** Contracts for the round-7 second batch: time-series gap-fill (q143),
  * PPS sampling (q144), and KMV overlap estimation (q139).
  */
class Round7bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round7b-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  // ------------------------------------------------------------------ q143

  test("q143 gap-fill: planted gaps materialize with zero counts and carried value") {
    val ev = Seq(
      // user 1: days 1 and 4 active -> days 2,3 are gaps carrying day-1's value
      (1L, "2024-03-01 10:00:00", 5.0), (1L, "2024-03-01 11:00:00", 7.0),
      (1L, "2024-03-04 09:00:00", 1.5),
      // user 2: single day, no gaps
      (2L, "2024-03-02 08:00:00", 3.0))
      .toDF("user_id", "s", "value")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("value"))
    val out = Analytics.gapFill(ev).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "2024-03-01", 2L, 12.0, 0L),
      (1L, "2024-03-02", 0L, 12.0, 1L),
      (1L, "2024-03-03", 0L, 12.0, 1L),
      (1L, "2024-03-04", 1L, 1.5, 0L),
      (2L, "2024-03-02", 1L, 3.0, 0L)))
  }

  test("q143 gap-fill invariants: events conserved, grid spans are dense") {
    val ev = Tables.events(spark, sf)
    val out = Analytics.gapFill(ev).cache()
    // every event lands in exactly one (user, day) row
    assert(out.agg(sum("n_events")).head.getLong(0) == ev.count())
    // per user: row count == inclusive day span (no missing, no extra days)
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (datediff(max("day"), min("day")) + 1).as("span"))
      .filter(col("rows") =!= col("span")).count()
    assert(spans == 0L)
    // ffill is non-null everywhere (first grid day is active by construction)
    assert(out.filter(col("ffill_value").isNull).count() == 0L)
    out.unpersist()
  }

  // ------------------------------------------------------------------ q144

  test("q144 PPS: matches a driver-side reference and is partitioning-invariant") {
    val docs = Tables.documents(spark, sf)
    val out = Datasets.ppsSample(docs).collect().map(_.getLong(0)).toSeq
    // driver reference: same integer threshold test in BigInt arithmetic
    val rows = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val w = rows.map(_._2).sum
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val want = rows.filter { case (id, nc) =>
      BigInt(h60(id.toString)) * w < BigInt(100) * nc * (BigInt(1) << 60)
    }.map(_._1).sorted.toSeq
    assert(out == want)
    // invariance: a different partitioning yields the identical sample
    val out2 = Datasets.ppsSample(docs.repartition(13)).collect().map(_.getLong(0)).toSeq
    assert(out2 == out)
  }

  test("q144 PPS: inclusion probability honest (p in (0,1], weight = 1/p)") {
    val out = Datasets.ppsSample(Tables.documents(spark, sf01)).collect()
    out.foreach { r =>
      val p = r.getDouble(3)
      assert(p > 0.0 && p <= 1.0)
      assert(r.getDouble(4) == 1.0 / p)
    }
  }

  // ------------------------------------------------------------------ q139

  test("q139 KMV overlap: exact when sketches are unsaturated") {
    // tiny synthetic corpus: two sources, controlled 8-gram overlap far
    // below k=64 -> merged sketch holds the FULL union, so est_union and
    // est_jaccard must be EXACT (the sketch degrades to the true sets)
    val words = (0 until 20).map(i => s"w$i")
    def doc(off: Int) = (off until off + 12).map(i => words(i % 20)).mkString(" ")
    val docs = Seq(
      (1L, doc(0), "a"), (2L, doc(0), "a"),
      (3L, doc(0), "b"), (4L, doc(8), "b"))
      .toDF("doc_id", "text", "source")
    val r = Datasets.kmvOverlap(docs).collect()
    assert(r.length == 1)
    val row = r.head
    // grams per doc: 12 tokens -> 5 8-grams; exact sets via brute force
    val ref = docs.select(col("source"),
        explode(graft.functions.VectorFunctions.wordNgramList(col("text"), 8)).as("g"))
      .distinct().collect().map(x => (x.getString(0), x.getString(1)))
    val sa = ref.filter(_._1 == "a").map(_._2).toSet
    val sb = ref.filter(_._1 == "b").map(_._2).toSet
    assert(row.getAs[Int]("k_used") == (sa ++ sb).size)
    assert(row.getAs[Int]("shared_in_sketch") == (sa & sb).size)
    assert(row.getAs[Double]("est_union") == (sa ++ sb).size.toDouble)
    assert(row.getAs[Double]("est_jaccard") ==
      (sa & sb).size.toDouble / (sa ++ sb).size.toDouble)
  }

  test("q139 KMV overlap: saturated estimate lands near the exact jaccard") {
    // sf0.01 documents: compare the sketch estimate against the exact q112
    // overlap for every source pair; k=64 gives ~1/sqrt(64) ~ 12% std err,
    // so a +/-0.35 absolute envelope is a conservative non-flaky bound
    val docs = Tables.documents(spark, sf01)
    val est = Datasets.kmvOverlap(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Double]("est_jaccard"))).toMap
    val exact = Datasets.sourceOverlap(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Double]("jaccard"))).toMap
    // q112 emits only pairs with shared grams; q139 emits all pairs
    assert(est.keySet.size >= exact.keySet.size)
    exact.foreach { case (k, j) =>
      assert(math.abs(est(k) - j) <= 0.35, s"pair $k: est=${est(k)} exact=$j")
    }
  }
}
