package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Round-9 second batch (q164-q168): dedup reporting, cross-source dup
  * forensics, length histograms, UniMax allocation, contamination
  * evidence. Fixture-driven invariants beyond the DuckDB hash gate.
  */
class Round9OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round9-spec", cores = 4)
  val sf01 = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ------------------------------------------------------------------ q164

  test("q164: dup accounting on a planted fixture") {
    val docs = docsOf(Seq(
      (1L, "a", "same text"), (2L, "a", "same text"), (3L, "a", "unique one"),
      (4L, "b", "same text"), (5L, "b", "other text")))
    val got = Dedup.dedupReport(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // source a: 3 docs, 2 distinct contents, 2 docs in the global
    // "same text" cluster (size 3); source b: 1 of 2 docs in it
    assert(got("a") == ((3L, 2L, 2L, 3L)))
    assert(got("b") == ((2L, 2L, 1L, 3L)))
  }

  // ------------------------------------------------------------------ q165

  test("q165: only cross-source shared contents count, within-source dups don't") {
    val docs = docsOf(Seq(
      (1L, "a", "shared one"), (2L, "b", "shared one"),
      (3L, "a", "only in a"), (4L, "a", "only in a"), // within-source dup
      (5L, "c", "shared one"), (6L, "c", "a c only"), (7L, "b", "a c only")))
    val got = Dedup.crossDupMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 2L))
  }

  // ------------------------------------------------------------------ q166

  test("q166: power-of-two boundaries land in the right bucket exactly") {
    val docs = docsOf(Seq(
      (1L, "s", Seq.fill(1)("w").mkString(" ")),   // 1 token  -> bucket 0
      (2L, "s", Seq.fill(2)("w").mkString(" ")),   // 2        -> bucket 1
      (3L, "s", Seq.fill(3)("w").mkString(" ")),   // 3        -> bucket 1
      (4L, "s", Seq.fill(4)("w").mkString(" ")),   // 4        -> bucket 2
      (5L, "s", Seq.fill(31)("w").mkString(" ")),  // 31       -> bucket 4
      (6L, "s", Seq.fill(32)("w").mkString(" ")))) // 32       -> bucket 5
    val got = TextAnalysis.lengthHistogram(docs).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      0L -> ((1L, 1L, 1L)), 1L -> ((2L, 2L, 5L)), 2L -> ((4L, 1L, 4L)),
      4L -> ((16L, 1L, 31L)), 5L -> ((32L, 1L, 32L))))
  }

  // ------------------------------------------------------------------ q167

  test("q167: water-filling invariants on the corpus") {
    val rows = Curation.unimaxAllocation(Tables.documents(spark, sf01)).collect()
    val budget = 100000L
    val capSum = rows.map(_.getLong(2)).sum
    // allocations sum to exactly min(B, total capacity)
    assert(rows.map(_.getLong(3)).sum == math.min(budget, capSum))
    // never exceed the cap; epochs never exceed MaxEpochs
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), r.getString(0))
      assert(r.getDouble(4) <= 4.0 + 1e-12, r.getString(0))
    }
    // equal-up-to-1 among unsaturated allocations
    val unsat = rows.filter(r => r.getLong(3) < r.getLong(2)).map(_.getLong(3))
    if (unsat.nonEmpty) assert(unsat.max - unsat.min <= 1,
      s"unsaturated shares spread > 1: ${unsat.min}..${unsat.max}")
  }

  test("q167: hand-computed fixture (mixed saturation + remainder)") {
    // token counts 2/3/25 with maxEpochs 4 -> caps 8/12/100; budget 50:
    //   sorted caps [8,12,100]: 8*3=24<=50 sat; 12*2=24<=42 sat;
    //   100>30 unsat -> share=30, no remainder
    val words = Map("a" -> 2, "b" -> 3, "c" -> 25)
    val docs = docsOf(words.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((src, n), i) => (i.toLong, src, Seq.fill(n)("w").mkString(" "))
    })
    val got = Curation.unimaxAllocation(docs, budget = 50L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("a" -> 8L, "b" -> 12L, "c" -> 30L))
    // remainder distribution: caps 8/8/8, budget 7 -> share 2, rem 1 to "a"
    val docs2 = docsOf(Seq((1L, "a", "w w"), (2L, "b", "w w"), (3L, "c", "w w")))
    val got2 = Curation.unimaxAllocation(docs2, budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got2 == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  // ------------------------------------------------------------------ q169

  test("q169: the exact quantile always falls inside the estimated bucket") {
    val rows = graft.operators.Datasets.histQuantiles(Tables.documents(spark, sf01)).collect()
    assert(rows.length == 60) // 20 sources x 3 quantiles
    rows.foreach { r =>
      val (bucket, estLo, exact) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(estLo == (1L << bucket.toInt))
      assert(exact >= estLo && exact < 2 * estLo,
        s"${r.getString(0)} q${r.getInt(1)}: exact $exact outside [$estLo, ${2 * estLo})")
    }
    // p50 <= p90 <= p99 per source on the exact values
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val byQ = rs.map(r => r.getInt(1) -> r.getLong(5)).toMap
      assert(byQ(50) <= byQ(90) && byQ(90) <= byQ(99), src)
    }
  }

  // ------------------------------------------------------------------ q170

  test("q170: D in [0,1]; identical-distribution fixture scores low, shifted scores high") {
    val corpus = Tables.documents(spark, sf01)
    graft.operators.Datasets.ksDrift(corpus).collect().foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, r.getString(0))
    }
    // fixture: source b is a copy of a (D small), source c fully shifted
    // (D = 1 at the crossing: every c-length exceeds every a/b-length)
    val docs = docsOf(
      (1 to 20).map(i => (i.toLong, "a", "x" * (10 + i))) ++
        (1 to 20).map(i => (100L + i, "b", "x" * (10 + i))) ++
        (1 to 20).map(i => (200L + i, "c", "x" * (1000 + i))))
    val d = graft.operators.Datasets.ksDrift(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d("a") == d("b"))
    assert(d("c") > d("a"))
    // c vs corpus: at v=30 (a+b fully arrived, c none): |0 - 40/60| = 2/3
    assert(math.abs(d("c") - 2.0 / 3.0) < 1e-12)
  }

  // ------------------------------------------------------------------ q171

  test("q171: templated text scores zero entropy; fair coin scores ln 2") {
    // every w1 has ONE continuation -> H = 0 exactly
    val templated = docsOf(Seq((1L, "t", ("a b " * 50).trim)))
    val t = graft.operators.Curation.bigramEntropy(spark, templated).head()
    assert(t.getDouble(3) == 0.0 && t.getDouble(4) == 1.0)
    // "a x a y a x a y ...": after 'a' the continuation is a fair coin
    // between x and y; after x/y always 'a'. H = P(w1=a)·ln2.
    val coin = docsOf(Seq((1L, "c", ("a x a y " * 25).trim)))
    val c = graft.operators.Curation.bigramEntropy(spark, coin).head()
    val nBig = c.getLong(1)
    val aCount = 50.0 // 'a' appears as w1 50 times of nBig bigrams
    val want = (aCount / nBig) * math.log(2.0)
    assert(math.abs(c.getDouble(3) - want) < 1e-9,
      s"entropy ${c.getDouble(3)} want $want")
  }

  // ------------------------------------------------------------------ q168

  test("q168: evidence rows cover exactly the eval docs with overlap; top-1 is argmax") {
    val rows = Curation.contaminationEvidence(spark, sf01).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "one row per eval doc")
    assert(ids.forall(_ < 100L))
    rows.foreach { r =>
      assert(r.getLong(1) >= 100L) // best match is a train doc
      assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(3))
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    // argmax agrees with the full q87-style pair table computed directly
    val sh = Dedup.shingledHashed(Tables.documents(spark, sf01)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val evalIds = sh.keys.filter(_ < 100L)
    evalIds.foreach { e =>
      val best = sh.filter(_._1 >= 100L)
        .map { case (t, s) => (t, (s & sh(e)).size.toLong) }
        .filter(_._2 >= 1L).toSeq
        .sortBy { case (t, n) => (-n, t) }.headOption
      val row = rows.find(_.getLong(0) == e)
      (best, row) match {
        case (Some((t, n)), Some(r)) =>
          assert(r.getLong(1) == t && r.getLong(2) == n, s"eval $e")
        case (None, None) => ()
        case other => fail(s"eval $e: presence mismatch $other")
      }
    }
  }
}
