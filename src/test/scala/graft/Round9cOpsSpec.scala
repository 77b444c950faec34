package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.{Analytics, Classify, Datasets, Dedup, Evaluation, Graph, Lakehouse, Mining, Profiling, Search}

/** Round-9 third batch (q211-q214): RRF hybrid fusion, Neyman
  * allocation, Adamic-Adar link prediction, 1-D EMD drift.
  * Fixture-driven invariants beyond the DuckDB hash gate.
  */
class Round9cOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round9c-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: Seq[(Long, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text, nc) => (id, text, "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ------------------------------------------------------------------ q211

  test("q211: doc on both lists fuses both reciprocal terms; one-list docs get one") {
    // doc 1: hits the query terms AND is clean text -> on both lists
    // doc 2: pure query terms but symbol-heavy -> strong tf, weak quality
    // doc 3: clean but no query terms -> quality list only (tf=0 still ranks,
    //        all three docs fit in the 50-slot lists)
    val d = docs(Seq(
      (1L, "a", "table part table data row", 25L),
      (2L, "a", "part part #### $$$$ %%%% ^^^^ &&&& !!!!", 39L),
      (3L, "a", "clean plain words only here today", 33L)))
    val got = Search.rrfFusion(d).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3)))).toMap
    // tf: doc1=3, doc2=2, doc3=0 -> ranks 1,2,3; all docs present on both lists
    assert(got(1L)._1.contains(1L) && got(2L)._1.contains(2L) && got(3L)._1.contains(3L))
    // every fused score is the exact two-term sum of its ranks
    got.foreach { case (_, (ra, rb, rrf)) =>
      val expect = ra.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        rb.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-15)
    }
  }

  test("q211: fused top-N is capped and sorted by score") {
    val many = docs((1L to 60L).map(i =>
      (i, "a", if (i <= 5) "table part" else s"filler words $i", 10L)))
    val rows = Search.rrfFusion(many).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  // ------------------------------------------------------------------ q212

  test("q212: all budget flows to the only stratum with spread") {
    val d = docs(Seq(
      (1L, "a", "w", 1L), (2L, "a", "w w w", 5L),       // lens 1,3 -> std 1
      (3L, "b", "x x", 3L), (4L, "b", "y y", 3L)))      // lens 2,2 -> std 0
    val got = Datasets.neymanAlloc(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got("a") == ((2L, 1.0, 1000L)))
    assert(got("b")._2 == 0.0 && got("b")._3 == 0L)
  }

  test("q212: equal strata split the budget; quotas never exceed it") {
    val d = docs(Seq(
      (1L, "a", "w", 1L), (2L, "a", "w w w", 5L),
      (3L, "b", "x", 1L), (4L, "b", "x x x", 5L)))
    val got = Datasets.neymanAlloc(d).collect().map(_.getLong(3))
    assert(got.toSeq == Seq(500L, 500L))
  }

  // ------------------------------------------------------------------ q213

  test("q213: single wedge predicts the missing link at 1/ln(deg)") {
    import spark.implicits._
    // baskets {1,2} and {2,3}: edges 1-2, 2-3; the only non-adjacent
    // common-neighbor pair is (1,3) through center 2 with degree 2
    val li = Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val rows = Graph.adamicAdar(spark, li).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - 1.0 / math.log(2.0)) < 1e-9)
  }

  test("q213: existing edges are excluded, rarer hubs score higher") {
    import spark.implicits._
    // K3 on {1,2,3} (all adjacent) plus pendant 4-1 and 5-1:
    // (4,5) share only hub 1 (deg 4); (2,3) adjacent -> excluded;
    // (2,4),(3,4),(2,5),(3,5) share center 1 as well
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 1L), (3L, 5L), (3L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val rows = Graph.adamicAdar(spark, li).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 3L)))
    assert(pairs.contains((4L, 5L)))
    // every returned score is k/ln(deg(1)) with deg(1)=4
    rows.foreach { r =>
      val k = r.getLong(2).toDouble
      assert(math.abs(r.getDouble(3) - k / math.log(4.0)) < 1e-9)
    }
  }

  // ------------------------------------------------------------------ q214

  test("q214: disjoint one-bucket sources sit half a bucket from the blend") {
    val d = docs(Seq(
      (1L, "a", "t", 1L), (2L, "a", "t", 1L),   // bucket 0
      (3L, "b", "t", 2L), (4L, "b", "t", 2L)))  // bucket 1
    val got = Profiling.emdDrift(d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(got("a") - 0.5) < 1e-12)
    assert(math.abs(got("b") - 0.5) < 1e-12)
  }

  // ------------------------------------------------------------------ q219

  test("q219: case-variant dups break blocking, exact dups survive it") {
    val d = docs(Seq(
      (1L, "a", "Hello world", 11L), (2L, "a", "hello world", 11L), // norm-dup, split blocks
      (3L, "a", "same txt", 8L), (4L, "a", "same txt", 8L)))        // raw dup, same block
    val r = Dedup.blockingQuality(d).head()
    assert(r.getLong(0) == 4L)
    // pair counts emit as double since round 11 (pandas-representation
    // pin vs the oracle); internal sums remain decimal(38,0)-exact
    assert(r.getDouble(1) == 6.0)  // C(4,2)
    assert(r.getDouble(2) == 1.0)  // only the "same" block pairs
    assert(math.abs(r.getDouble(3) - (1.0 - 1.0 / 6.0)) < 1e-15)
    assert(r.getDouble(4) == 2.0)  // two true dup pairs
    assert(r.getDouble(5) == 1.0)  // blocking finds only the raw one
    assert(math.abs(r.getDouble(6) - 0.5) < 1e-15)
  }

  // ------------------------------------------------------------------ q220

  test("q220: bucket digests agree exactly where no rows were cut") {
    val rows = Lakehouse.q220MerkleDiff(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      val same = r.getString(3) == r.getString(4)
      if (na == nb && same) assert(!r.getBoolean(5))
      if (na != nb) assert(r.getBoolean(5))
      assert(na >= nb) // snapshot B is a subset
    }
    // the simulated elder snapshot genuinely differs somewhere
    assert(rows.exists(_.getBoolean(5)))
  }

  // ------------------------------------------------------------------ q221

  test("q221: constant-length corpus pins every replicate mean to that length") {
    val d = docs((1L to 40L).map(i => (i, "a", "five words of plain text", 24L)))
    val rows = Datasets.bootstrapMeans(d).collect()
    assert(rows.length == 32)
    rows.foreach { r =>
      if (!r.isNullAt(2)) assert(r.getDouble(2) == 5.0, r.toString)
      assert(r.getLong(1) >= 0L)
    }
    // Poisson(1) reweighting keeps the effective mass near n on average
    val meanEff = rows.map(_.getLong(1)).sum.toDouble / 32.0
    assert(meanEff > 20.0 && meanEff < 60.0)
  }

  // ------------------------------------------------------------------ q222

  test("q222: within-source fold sizes differ by at most one, dealt exactly") {
    val d = docs((1L to 7L).map(i => (i, "a", s"t $i", 3L)) ++
      (11L to 20L).map(i => (i, "b", s"t $i", 3L)))
    val rows = Datasets.stratifiedKFold(d).collect()
    val a = rows.filter(_.getString(0) == "a").map(r => r.getLong(1) -> r.getLong(2)).toMap
    val b = rows.filter(_.getString(0) == "b").map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(a.values.sum == 7L && a.values.forall(n => n == 1L || n == 2L))
    assert(b.values.sum == 10L && b.values.forall(_ == 2L))
    assert(rows.filter(_.getString(0) == "a").forall(_.getLong(3) == 1L))
    assert(rows.filter(_.getString(0) == "b").forall(_.getLong(3) == 0L))
  }

  // ------------------------------------------------------------------ q215

  test("q215: when all signal lives in the first 8 dims, every prefix has recall 1") {
    import spark.implicits._
    // 64-dim vectors whose dims 8..63 are all zero: truncation loses nothing
    val embs = (0L until 12L).map { i =>
      val v = Array.tabulate(64)(d =>
        if (d < 8) math.cos((i * 8 + d).toDouble).toFloat else 0.0f)
      (i, v, 0)
    }.toDF("vec_id", "embedding", "label")
    val rows = Evaluation.matryoshkaRecall(spark, embs).collect()
    // full (dims x queries) grid, zero-filled
    assert(rows.length == 3 * 10)
    rows.foreach(r => assert(r.getDouble(3) == 1.0, r.toString))
  }

  test("q215: an adversarial tail flips the prefix-8 ranking below recall 1") {
    import spark.implicits._
    // query 0; neighbor 10 matches the PREFIX, neighbor 11 matches the TAIL.
    // Corpus size 12 keeps k=10 lists meaningful: with only 11 non-query
    // candidates, recall@10 misses at most one — make it miss exactly the
    // tail-matching one at m=8.
    def vec(pre: Float, tail: Float) =
      Array.tabulate(64)(d => if (d < 8) pre else tail)
    val base = (1L until 10L).map(i =>
      (i, Array.tabulate(64)(d => math.sin((i * 64 + d).toDouble).toFloat), 0))
    val embs = (Seq(
      (0L, vec(1.0f, 1.0f), 0),
      (10L, vec(1.0f, -1.0f), 0),
      (11L, vec(-1.0f, 1.0f), 0)) ++ base)
      .toDF("vec_id", "embedding", "label")
    val got = Evaluation.matryoshkaRecall(spark, embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // at m=8 query 0 sees neighbor 11 as its ANTIPODE and 10 as identical;
    // full-dim truth ranks both mid-list, so the m=8 list still contains
    // >=9 of the 10 true neighbors
    assert(got((8L, 0L)) <= 1.0 && got((32L, 0L)) >= got((8L, 0L)))
  }

  // ------------------------------------------------------------------ q216

  test("q216: planted weekly pattern recovers seasonal = phase - 3 exactly") {
    import spark.implicits._
    // 14 days, count = phase+1 (phase = epoch-day % 7): every complete
    // 7-day window sums to 28, so seasonal(phase) = phase - 3 exactly
    val rows = (0 until 14).flatMap { day =>
      val phase = day % 7
      (0 to phase).map(k => new java.sql.Timestamp(
        day * 86400000L + k * 1000L))
    }
    val events = rows.toDF("ts")
    val got = Analytics.seasonalDecompose(spark, events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got.keySet == (0L to 6L).toSet)
    (0L to 6L).foreach { p =>
      assert(math.abs(got(p)._2 - (p - 3.0)) < 1e-12, s"phase $p: ${got(p)}")
    }
    // days 3..10 have complete windows: phase 3 twice, the rest once
    assert(got(3L)._1 == 2L && got(0L)._1 == 1L)
  }

  // ------------------------------------------------------------------ q217

  test("q217: huge hash space has no collisions; one bucket collides everything") {
    val d = docs(Seq((1L, "a", "w w w x", 7L)))
    val wide = Classify.featureHashQuality(d, buckets = 1L << 40).head()
    assert(wide.getLong(0) == 2L && wide.getDouble(3) == 0.0 &&
      wide.getDouble(5) == 0.0)
    val one = Classify.featureHashQuality(d, buckets = 1L).head()
    // terms w(3), x(1) -> 1 bucket: term rate 1/2, mass rate (4-3)/4
    assert(one.getLong(2) == 1L)
    assert(math.abs(one.getDouble(3) - 0.5) < 1e-15)
    assert(math.abs(one.getDouble(5) - 0.25) < 1e-15)
  }

  // ------------------------------------------------------------------ q218

  test("q218: KN probabilities on a planted corpus; continuations sum to 1") {
    val d = docs(Seq(
      (1L, "a", "a b", 3L), (2L, "a", "a b", 3L), (3L, "a", "a c", 3L)))
    val got = Mining.kneserNey(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(7)).toMap
    // c(a,b)=2, c(a,c)=1, c(a.)=3, N1+(a,.)=2, N1+(.,b)=N1+(.,c)=1, T=2
    val pb = (2.0 - 0.75) / 3.0 + 0.75 * 2.0 / 3.0 * (1.0 / 2.0)
    val pc = (1.0 - 0.75) / 3.0 + 0.75 * 2.0 / 3.0 * (1.0 / 2.0)
    assert(math.abs(got(("a", "b")) - pb) < 1e-15)
    assert(math.abs(got(("a", "c")) - pc) < 1e-15)
    assert(math.abs((pb + pc) - 1.0) < 1e-12) // KN mass conservation
  }

  test("q214: a source matching the corpus has zero EMD; farther mass costs more") {
    val d = docs(Seq(
      (1L, "a", "t", 1L), (2L, "a", "t", 2L),   // a == corpus shape where b==c mirror
      (3L, "b", "t", 1L), (4L, "b", "t", 2L),
      (5L, "c", "t", 1L), (6L, "c", "t", 200L))) // c pushes mass 7 buckets away
    val got = Profiling.emdDrift(d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("c") > got("a") && got("c") > got("b"))
  }
}
