package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Analytics, Curation, Datasets, Dedup, Graph, Mining}

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

  // ------------------------------------------------------------------ q142

  test("q142 containment: doc-inside-doc found where jaccard misses it") {
    val small = (1 to 6).map(i => s"tok$i").mkString(" ")
    val big = small + " " + (7 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, (50 to 80).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every shingle of doc 1 appears in doc 2 -> containment exactly 1.0;
    // nothing else qualifies in either direction
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
    // and jaccard at the same threshold does NOT pair them (the case q21
    // structurally cannot catch)
    assert(Dedup.jaccardPairs(docs, threshold = 0.9).count() == 0L)
  }

  test("q142 containment: prefix-filter candidates are complete vs brute force") {
    val docs = Tables.documents(spark, sf)
    val got = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = Dedup.shingledHashed(docs).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
    val want = (for {
      (ida, sa) <- sets; (idb, sb) <- sets
      if ida != idb && sa.nonEmpty
      if (sa & sb).size.toDouble / sa.size >= 0.9
    } yield (ida, idb)).toSet
    assert(got == want)
  }

  // ------------------------------------------------------------------ q140

  test("q140 typo join: catches all three edit kinds, rejects distance 2") {
    val parts = Seq("hello word", "helo word", "hello ward", "hallo word",
      "from form").flatMap(n => Seq.fill(3)(n)).toDF("p_name")
    val got = Curation.typoPairs(parts).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // deletion (hello/helo), substitutions (hallo/hello, ward/word),
    // but NOT the transposition form/from (levenshtein distance 2)
    assert(got == Set(("hello", "helo"), ("hallo", "hello"), ("ward", "word")))
    // counts ride along: every token appears with its occurrence count
    val counts = Curation.typoPairs(parts).collect()
      .map(r => (r.getString(1), r.getLong(3))).toMap
    assert(counts("helo") == 3L && counts("hello") == 6L)
  }

  // ------------------------------------------------------------------ q141

  test("q141 ccStar: high-diameter path converges (min-label could not in 20 rounds)") {
    // path 0-1-...-199 (diameter 199) plus an island 1000-...-1009: the
    // alternating star algorithm must label both in <= 20 rounds
    val edges = (0L until 199L).map(i => (i, i, i + 1)) ++
      (0L until 9L).map(i => (500L + i, 1000L + i, 1001L + i))
    val li = edges.toDF("l_orderkey", "ignore", "x")
      .select(col("l_orderkey"), col("ignore").as("l_partkey"))
      .union(edges.toDF("l_orderkey", "ignore", "x")
        .select(col("l_orderkey"), col("x").as("l_partkey")))
    val out = Graph.ccStar(spark, li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L to 199L).foreach(v => assert(out(v) == 0L, s"node $v"))
    (1000L to 1009L).foreach(v => assert(out(v) == 1000L, s"node $v"))
  }

  test("q141 ccStar throws when the round budget is exhausted (no silent partial labels)") {
    // two-node graph but ZERO allowed rounds: the contraction cannot even
    // start — returning labels here would be silently wrong, so the
    // contract is an explicit failure
    val li = Seq((1L, 10L), (1L, 20L)).toDF("l_orderkey", "l_partkey")
    val ex = intercept[IllegalStateException] {
      Graph.ccStar(spark, li, maxRounds = 0)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("q141 ccStar == union-find closure on the sf0.001 co-purchase graph") {
    val li = Tables.lineitem(spark, sf)
    val got = Graph.ccStar(spark, li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the established q49 closure over the same edge list
    val und = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("doc_a"), col("ps"))
      .select(col("doc_a"), explode(col("ps")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b")).distinct()
    val want = Dedup.connectedComponents(und).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  // ------------------------------------------------------------------ q145

  test("q145 apriori == driver-side brute-force triple counts") {
    val li = Tables.lineitem(spark, sf)
    val or = Tables.orders(spark, sf)
    val got = Mining.aprioriTriples(spark, li, or).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    val baskets = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted.toVector)
    val support = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    baskets.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.size; k <- j + 1 until ps.size)
        support((ps(i), ps(j), ps(k))) =
          support.getOrElse((ps(i), ps(j), ps(k)), 0L) + 1L
    }
    val want = support.filter(_._2 >= 3L).toMap
    assert(got == want)
  }
}
