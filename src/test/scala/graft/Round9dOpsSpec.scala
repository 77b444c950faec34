package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.{Analytics, Governance, Signals}

/** Round-9 fourth wave: changepoint detection (q223), Theil-Sen trend
  * (q224), Mann-Whitney rank-sum (q225), Cohen's kappa (q226). Fixtures
  * are hand-computable; the corpus-level hash check is the DuckDB oracle.
  */
class Round9dOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round9d-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  /** One event per unit at `count` events on each (0-based) day index. */
  private def dayEvents(counts: Seq[Int]): DataFrame = {
    import spark.implicits._
    val rows = for {
      (c, day) <- counts.zipWithIndex
      i <- 0 until c
    } yield new Timestamp(1700000000000L + day * 86400000L + i * 1000L)
    rows.toDF("ts")
  }

  // ------------------------------------------------------------------ q223

  test("q223: level shift found exactly; flat halves split with zero gain") {
    // 4 days at 5/day then 4 days at 20/day: the level-1 split must land
    // between day 4 and 5 with means (5, 20) and gain 240^2/(4*4*8).
    val got = Analytics.changepoint(spark, dayEvents(Seq(5, 5, 5, 5, 20, 20, 20, 20)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
    val lvl1 = got.filter(_._1 == 1L)
    assert(lvl1.length == 1)
    val (_, s0, e0, cut, nl, nr, ml, mr, g) = lvl1.head
    assert(e0 - s0 == 7L)          // 8-day segment
    assert(cut - s0 == 3L)         // split after the 4th day
    assert((nl, nr) == ((4L, 4L)))
    assert(ml == 5.0 && mr == 20.0)
    assert(g == 240.0 * 240.0 / (4.0 * 4.0 * 8.0))
    // both halves are flat: every level-2 candidate has gain 0, tie-broken
    // to the earliest day; means equal on both sides of the sub-split
    val lvl2 = got.filter(_._1 == 2L)
    assert(lvl2.length == 2)
    for ((_, s2, e2, c2, nl2, _, ml2, mr2, g2) <- lvl2) {
      assert(g2 == 0.0 && c2 == s2 && nl2 == 1L && ml2 == mr2)
      assert(e2 - s2 == 3L)
    }
  }

  test("q223: single-day segments produce no level-2 split row") {
    // split lands after day 1 of 2 -> both halves have length 1 -> lvl2 empty
    val got = Analytics.changepoint(spark, dayEvents(Seq(1, 30))).collect()
    assert(got.count(_.getLong(0) == 1L) == 1)
    assert(got.count(_.getLong(0) == 2L) == 0)
  }

  // ------------------------------------------------------------------ q224

  test("q224: Theil-Sen shrugs off an outlier day that would wreck OLS") {
    // y = 2x + 1 on 9 days, except day 5 spikes to 100: the median pairwise
    // slope is still exactly 2 and the median residual exactly 1.
    val counts = (1 to 9).map(x => if (x == 5) 100 else 2 * x + 1)
    val r = Analytics.theilSen(spark, dayEvents(counts)).collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 36L)
    assert(r.getDouble(2) == 2.0, "slope must ignore the outlier")
    assert(r.getDouble(3) == 1.0, "intercept is the median residual")
  }

  // ------------------------------------------------------------------ q225

  private def docsOf(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, nc) => (id, "t", "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("q225: U exact on a no-overlap split and under ties") {
    // A = {1,2,3}, B = {4,5,6}: every A below every B -> U_A = 0, U_B = 9
    val g1 = Governance.mannWhitney(docsOf(Seq(
      (1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
      (4L, "B", 4L), (5L, "B", 5L), (6L, "B", 6L))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(g1("A") == ((3L, 0.0)))
    assert(g1("B") == ((3L, 9.0)))
    // ties: A = {1,2,2}, B = {2,3}: avg rank of the 2s is 3 ->
    // R_A = 1+3+3 = 7, U_A = 7 - 3*4/2 = 1 (and U_B = n1*n2 - U_A = 5)
    val g2 = Governance.mannWhitney(docsOf(Seq(
      (1L, "A", 1L), (2L, "A", 2L), (3L, "A", 2L),
      (4L, "B", 2L), (5L, "B", 3L))))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(g2("A") == 1.0 && g2("B") == 5.0)
  }

  test("q225: z sign tracks the shift direction and is null for a lone source") {
    val g = Governance.mannWhitney(docsOf(
      (1L to 8L).map(i => (i, "lo", i)) ++ (9L to 16L).map(i => (i, "hi", i + 100))))
      .collect().map(r => r.getString(0) -> Option(r.get(3)).map(_.toString.toDouble)).toMap
    assert(g("lo").get < -3.0 && g("hi").get > 3.0)
    val lone = Governance.mannWhitney(docsOf(Seq((1L, "only", 5L), (2L, "only", 6L))))
      .collect()
    assert(lone.length == 1 && lone.head.isNullAt(3), "n2 = 0 must yield null z")
  }

  // ------------------------------------------------------------------ q226

  private def textDocs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("q226: identical raters give kappa 1; contingency sums to n") {
    // Two doc populations: clean repeated common bigrams (high LM score,
    // decent quality) vs symbol soup (low quality, rare bigrams). Both
    // raters should separate them the same way -> kappa = 1 per source.
    // good: 60 clean words -> quality 0.6 >= 0.5; bigrams mostly
    // deterministic -> avg_logp ~ -0.24, above the corpus mean.
    // bad: 6 words -> quality 0.06; per-doc-unique continuations after the
    // shared "zz" make p(next|zz) = 1/18 -> avg_logp ~ -1.73, below mean.
    val good = ("the cat sat on the mat " * 10).trim
    val docs = textDocs((1L to 6L).map(i => (i, "s", good)) ++
      (7L to 12L).map(i => (i, "s", s"zz qa$i zz qb$i zz qc$i")))
    val r = Signals.kappaOf(spark, docs).collect()
    assert(r.length == 1)
    val row = r.head
    val (n, n11, n10, n01, n00) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(n11 + n10 + n01 + n00 == n)
    // recompute kappa from the counts the engine reported
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) + (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    assert(row.getDouble(6) == po && row.getDouble(7) == pe)
    if (pe != 1.0) assert(row.getDouble(8) == (po - pe) / (1.0 - pe))
    // the two populations really did split: diagonal-only contingency
    assert(n10 == 0 && n01 == 0, s"raters disagreed: $row")
    assert(row.getDouble(8) == 1.0)
  }

  test("q226: degenerate corpus (all docs identical) pins kappa to null") {
    // every doc passes BOTH gates (60 clean words; equal LM scores sit at
    // the mean, and the threshold is >=) -> both raters constant-true ->
    // po = pe = 1 -> kappa is pinned to null, not 0/0
    val docs = textDocs((1L to 4L).map(i =>
      (i, "s", ("the cat sat on the mat " * 10).trim)))
    val r = Signals.kappaOf(spark, docs).collect().head
    assert(r.getDouble(6) == 1.0 && r.getDouble(7) == 1.0 && r.isNullAt(8))
  }
}
