package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.{Evaluation, Graph}

/** Round-9 graph/behavior operators (q191–q193): exact fixtures (known
  * k-core, perfect-star assortativity, hand-counted sequence patterns)
  * plus the q191 fixpoint guarantee on the real corpus.
  */
class GraphBehaviorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("graph-behavior-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  /** Baskets encoded as a minimal lineitem frame (order -> part set). */
  private def lineitemOf(baskets: Seq[Seq[Long]]): DataFrame = {
    import spark.implicits._
    baskets.zipWithIndex.flatMap { case (parts, o) =>
      parts.map(p => (o.toLong, p))
    }.toDF("l_orderkey", "l_partkey")
  }

  // ------------------------------------------------------------------ q191

  test("q191: a clique survives the peel, pendant chain does not") {
    // K4 on {1,2,3,4} + chain 4-5-6: 3-core is exactly the K4
    val li = lineitemOf(Seq(Seq(1L, 2L, 3L, 4L), Seq(4L, 5L), Seq(5L, 6L)))
    val got = Graph.kcore(spark, li, k = 3, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 3L))
  }

  test("q191: pinned rounds reach the peel fixpoint on the corpus") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val atPinned = Graph.kcore(spark, li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePast = Graph.kcore(spark, li, rounds = Graph.KcoreRounds + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atPinned == onePast, "an extra peel round must be a no-op")
    assert(atPinned.nonEmpty && atPinned.forall(_._2 >= Graph.KcoreK))
  }

  // ------------------------------------------------------------------ q192

  test("q192: a perfect star is exactly disassortative (r = -1)") {
    // star: hub 1 with leaves 2,3,4 (one basket per edge so degrees are 3/1)
    val li = lineitemOf(Seq(Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L)))
    val r = Graph.assortativity(spark, li).collect().head
    assert(r.getLong(0) == 6L) // both directions
    assert(math.abs(r.getDouble(2) - (-1.0)) < 1e-12)
  }

  test("q192: corpus assortativity is a defined correlation in [-1, 1]") {
    val r = Graph.assortativity(spark, graft.core.Tables.lineitem(spark, sf))
      .collect().head
    assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
  }

  // ------------------------------------------------------------------ q193

  private def eventsOf(rows: Seq[(Long, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (eid, uid, minute, typ) =>
      (eid, new Timestamp(1700000000000L + minute * 60000L), uid, typ, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("q193: first-occurrence ordering within sessions, hand-counted supports") {
    // u1 session 1: A(0) B(1) C(2); u2 session 1: B(0) A(1)
    val ev = eventsOf(Seq(
      (1L, 1L, 0L, "A"), (2L, 1L, 1L, "B"), (3L, 1L, 2L, "C"),
      (4L, 2L, 0L, "B"), (5L, 2L, 1L, "A")))
    val got = Evaluation.seqPatternsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("A", "B")) == ((1L, 2L, 0.5)))
    assert(got(("A", "C")) == ((1L, 2L, 0.5)))
    assert(got(("B", "C")) == ((1L, 2L, 0.5)))
    assert(got(("B", "A")) == ((1L, 2L, 0.5)))
    assert(got.size == 4)
  }

  test("q193: the 30-minute gap splits sessions — no cross-session patterns") {
    // A then B 40 minutes later: two sessions, zero patterns
    val ev = eventsOf(Seq((1L, 1L, 0L, "A"), (2L, 1L, 40L, "B")))
    assert(Evaluation.seqPatternsOf(ev).collect().isEmpty)
    // repeated type within a session does not self-pair
    val ev2 = eventsOf(Seq((1L, 1L, 0L, "A"), (2L, 1L, 1L, "A")))
    assert(Evaluation.seqPatternsOf(ev2).collect().isEmpty)
  }
}
