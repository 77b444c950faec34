package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Evaluation, Similarity}

/** Evaluation operators (q179–q184): ANN recall cross-checked against a
  * driver-side recomputation, class-weight normalization laws, exact
  * dispersion/quantization fixtures, and deterministic Markov/decay
  * fixtures.
  */
class EvaluationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("evaluation-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  // ------------------------------------------------------------------ q179

  test("q179: recall matches a driver-side intersection of the two top-k sets") {
    val embs = Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(spark, embs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(spark, embs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val got = Evaluation.annRecall(spark, embs).collect()
    assert(got.length == brute.size)
    got.foreach { r =>
      val q = r.getLong(0)
      val expHits = brute(q).intersect(ivf.getOrElse(q, Set.empty)).size.toLong
      assert(r.getLong(3) == expHits, s"query $q hits")
      assert(r.getDouble(4) == expHits.toDouble / 10.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(3) <= r.getLong(1))
    }
  }

  // ------------------------------------------------------------------ q180

  test("q180: effective numbers and normalized weights obey the Cui et al. laws") {
    import spark.implicits._
    // labels with sizes 1, 10, 1000
    val embs = ((1 to 1) ++ Seq.fill(10)(2) ++ Seq.fill(1000)(3))
      .zipWithIndex.map { case (lab, i) => (i.toLong, Array(1.0f), lab) }
      .toDF("vec_id", "embedding", "label")
    val rows = Evaluation.classWeights(embs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // n=1 -> E = 1 exactly
    assert(math.abs(rows(1)._2 - 1.0) < 1e-12)
    // E_n < n, E_n monotone in n, weights anti-monotone
    assert(rows(2)._2 < 10.0 && rows(3)._2 < 1000.0)
    assert(rows(1)._2 < rows(2)._2 && rows(2)._2 < rows(3)._2)
    assert(rows(1)._3 > rows(2)._3 && rows(2)._3 > rows(3)._3)
    // normalized to mean 1 over labels
    val mean = rows.values.map(_._3).sum / rows.size
    assert(math.abs(mean - 1.0) < 1e-6)
    // E_n is capped by 1/(1-beta)
    assert(rows(3)._2 < 1.0 / (1.0 - Evaluation.CbBeta))
  }

  // ------------------------------------------------------------------ q181

  test("q181: dispersion identity on an exactly-known basis fixture") {
    import spark.implicits._
    // label 0: e1=(1,0), e2=(0,1): norms 1, pairwise dist^2 = 2
    // label 1: identical vectors: dispersion 0
    val embs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(0.5f, 0.5f), 1), (4L, Array(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Evaluation.embedDispersion(embs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(0)._1 == 2L)
    assert(math.abs(got(0)._2 - 1.0) < 1e-9)
    assert(math.abs(got(0)._3 - 2.0) < 1e-9)
    assert(math.abs(got(1)._2 - 0.5) < 1e-9)
    assert(got(1)._3 == 0.0) // identical vectors: exact zero on the grid
  }

  // ------------------------------------------------------------------ q182

  test("q182: exactly-representable grid quantizes losslessly; known error reproduced") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(127.0f, -127.0f, 64.0f, 0.0f), 0), // integers <=127, scale=1
      (2L, Array(1.0f, 0.3f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Evaluation.quantError(embs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(0)._2 == 0.0 && got(0)._3 == 0.0)
    // label 1: x=0.3, scale=127 -> round(38.1)=38, deq=38/127
    val x = 0.3f.toDouble
    val err = math.pow(x - math.round(x * 127.0) * 1.0 / 127.0, 2)
    assert(math.abs(got(1)._2 - err / 2.0) < 1e-12)
    assert(math.abs(got(1)._3 - err) < 1e-12)
  }

  // ------------------------------------------------------------------ q183

  private def eventsOf(rows: Seq[(Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (eid, uid, typ, v) =>
      (eid, new Timestamp(1700000000000L + eid * 60000L), uid, typ, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("q183: transition counts and row-stochastic probabilities on a pinned chain") {
    // user 1: A B A B  -> A->B x2, B->A x1 ; user 2: A A -> A->A x1
    val ev = eventsOf(Seq(
      (1L, 1L, "A", 0.0), (2L, 1L, "B", 0.0), (3L, 1L, "A", 0.0), (4L, 1L, "B", 0.0),
      (5L, 2L, "A", 0.0), (6L, 2L, "A", 0.0)))
    val got = Evaluation.markovTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("A", "B")) == ((2L, 3L, 2.0 / 3.0)))
    assert(got(("A", "A")) == ((1L, 3L, 1.0 / 3.0)))
    assert(got(("B", "A")) == ((1L, 1L, 1.0)))
    assert(got.size == 3)
    // rows sum to 1 per from_type
    val byFrom = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._3).sum)
    byFrom.foreach { case (f, s) => assert(math.abs(s - 1.0) < 1e-12, f) }
  }

  // ------------------------------------------------------------------ q184

  test("q184: one-day-old events decay to half weight; anchor event keeps full weight") {
    val dayMs = 86400000L
    import spark.implicits._
    val ev = Seq(
      (1L, new Timestamp(1700000000000L), 1L, "A", 10.0), // 1 day before anchor
      (2L, new Timestamp(1700000000000L + dayMs), 1L, "A", 10.0), // anchor
      (3L, new Timestamp(1700000000000L + dayMs), 2L, "A", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Evaluation.decayWeighted(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 2L)
    assert(math.abs(got(1L)._2 - 15.0) < 1e-9) // 10 + 10*2^-1
    assert(math.abs(got(2L)._2 - 7.0) < 1e-9)
  }

  // ------------------------------------------------------------------ q189

  test("q189: gaps are per-user per-type; mean/median exact on a pinned grid") {
    // user 1 type A at minutes 0, 1, 3 -> gaps 60 s, 120 s
    // user 2 type A at minutes 0, 10   -> gap 600 s
    // user 1 type B single event       -> no gap
    val ev = eventsOf(Seq(
      (0L, 1L, "A", 0.0), (1L, 1L, "A", 0.0), (3L, 1L, "A", 0.0),
      (2L, 1L, "B", 0.0))) // event_id 2 -> minute 2, type B
      .unionByName(eventsOf(Seq((10L, 2L, "A", 0.0), (20L, 2L, "A", 0.0))))
    val got = Evaluation.interArrivalOf(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // eventsOf: ts = epoch + event_id minutes -> user2 gap = 10 min
    val gaps = Seq(60.0, 120.0, 600.0)
    assert(got("A")._1 == 3L)
    assert(math.abs(got("A")._2 - gaps.sum / 3.0) < 1e-12)
    assert(got("A")._3 == 120.0) // lower median of {60,120,600}
    assert(!got.contains("B"))
  }

  test("q183/q184 run on the real events table with sane shapes") {
    val mk = Evaluation.markovChain(spark, sf).collect()
    assert(mk.nonEmpty && mk.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
    val dc = Evaluation.decayActivity(spark, sf).collect()
    assert(dc.nonEmpty && dc.forall(r => r.getDouble(2) >= 0.0))
  }
}
