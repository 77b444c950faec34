package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Analytics, Classify, Curation, Datasets, EmbeddingStats, Graph}

/** Contracts for the round-7 operators: sessionization (q128), CMS heavy
  * hitters (q129), OLS trends (q130), feature MI (q131), boilerplate
  * stripping (q132), curriculum ordering (q133), triangle counting (q134),
  * and JL projection (q135).
  */
class Round7OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round7-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  // ------------------------------------------------------------------ q128

  test("q128 sessions == driver-side gap-scan reference") {
    val ev = Tables.events(spark, sf)
    val got = Analytics.sessionize(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // driver reference: sort each user's events, split on >30min gaps
    val raw = ev.select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var idx = 0L
      var prev = Long.MinValue
      val counts = scala.collection.mutable.LinkedHashMap[Long, Long]()
      sorted.foreach { e =>
        if (prev == Long.MinValue || e._3 - prev > 30L * 60 * 1000000) idx += 1
        counts(idx) = counts.getOrElse(idx, 0L) + 1
        prev = e._3
      }
      counts.map { case (i, n) => (uid, i, n) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("q128 plan: the window's user_id exchange is reused by the aggregate") {
    val df = Analytics.sessionize(Tables.events(spark, sf01))
    val plan = df.queryExecution.executedPlan.toString
    val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nHash == 1, s"expected exactly one hash exchange, got $nHash:\n$plan")
  }

  // ------------------------------------------------------------------ q129

  test("q129 CMS estimate >= exact for EVERY token, not just the top-k") {
    val docs = Tables.documents(spark, sf01)
    val all = Datasets.cmsHeavyHitters(docs, topK = 10000).collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(r.getLong(3) >= 0L,
        s"CMS must never undercount: ${r.getString(0)} overcount=${r.getLong(3)}")
    }
  }

  test("q129 sketch is mergeable and partitioning-independent") {
    val docs = Tables.documents(spark, sf01)
    val a = Datasets.cmsHeavyHitters(docs).collect().toSeq
    val b = Datasets.cmsHeavyHitters(docs.repartition(13)).collect().toSeq
    assert(a == b, "counter sums are commutative longs — layout must not matter")
  }

  // ------------------------------------------------------------------ q130

  test("q130 OLS matches a driver-side exact reference") {
    val docs = Tables.documents(spark, sf01)
    val got = Analytics.olsTrend(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val rows = docs.select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (src, xs) =>
      val n = xs.length.toDouble
      val sx = xs.map(_._2.toDouble).sum; val sy = xs.map(_._3.toDouble).sum
      val sxy = xs.map(t => t._2.toDouble * t._3.toDouble).sum
      val sxx = xs.map(t => t._2.toDouble * t._2.toDouble).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (gs, gi, gr2) = got(src)
      assert(math.abs(gs - slope) < 1e-9, s"$src slope $gs != $slope")
      assert(math.abs(gi - (sy - slope * sx) / n) < 1e-6)
      assert(gr2 >= 0.0 && gr2 <= 1.0 + 1e-12)
    }
  }

  // ------------------------------------------------------------------ q131

  test("q131 MI: non-negative everywhere; zero for an everywhere-token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa xx", "de"), (2L, "aa xx", "de"),
      (3L, "bb xx", "en"), (4L, "bb xx", "en")
    ).toDF("doc_id", "text", "lang")
    val mi = Classify.featureMi(docs, Seq("de", "en")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // xx is in every doc: presence carries zero information
    assert(mi("xx") == 0.0, s"everywhere-token MI must be exactly 0, got ${mi("xx")}")
    // aa/bb perfectly predict the class: MI == H(class) == ln 2
    // each ln is grid-pinned at 1e-9 (round-11 transcendental sweep), so
    // the analytic value is approached at grid, not ulp, precision
    assert(math.abs(mi("aa") - math.log(2)) < 1e-9)
    assert(math.abs(mi("bb") - math.log(2)) < 1e-9)
    val corpus = Classify.featureMi(Tables.documents(spark, sf01)).collect()
    corpus.foreach(r => assert(r.getDouble(2) >= -1e-8,
      s"MI must be >= 0 (to pin-grid precision): ${r.getString(0)} -> ${r.getDouble(2)}"))
  }

  // ------------------------------------------------------------------ q132

  test("q132 boilerplate: planted repeated block is stripped, unique text kept") {
    import spark.implicits._
    // 6 docs share an identical 3-token header block; tails are unique
    val docs = (1L to 6L).map(i => (i, s"the same header unique$i tail$i"))
      .toDF("doc_id", "text")
    val rows = Curation.boilerplateStrip(docs, blockSize = 3, minDf = 5).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == 2, "two 3-token blocks per 5-token doc")
      assert(r.getLong(2) == 1, s"header block must be boilerplate: $r")
      assert(r.getLong(4) == 2, s"kept = the 2-token unique tail: $r")
    }
    // accounting: kept + dropped tokens == total tokens, on the real corpus
    val real = Curation.boilerplateStrip(Tables.documents(spark, sf01))
    val tot = real.agg(sum(col("kept_tokens"))).head.getLong(0)
    val expected = Tables.documents(spark, sf01)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    val dropped = real.select(col("doc_id"), col("kept_tokens")).join(
      Tables.documents(spark, sf01).select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n")), "doc_id")
      .agg(sum(col("n") - col("kept_tokens"))).head.getLong(0)
    assert(tot + dropped == expected, "token accounting must close")
  }

  // ------------------------------------------------------------------ q133

  test("q133 curriculum: difficulty monotone within source, balanced prefixes") {
    val rows = Curation.curriculumOrder(Tables.documents(spark, sf01), limit = 500)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // within each source, rank order == difficulty order
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val byRank = xs.sortBy(_._3).map(_._2)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    // every prefix that ends on a rank boundary has equal per-source counts
    val perSource = rows.groupBy(_._1).map { case (s, xs) => s -> xs.length }
    assert(perSource.values.toSet.size == 1,
      s"20 sources x 25 docs at sf0.01: full manifest is balanced, got $perSource")
  }

  // ------------------------------------------------------------------ q134

  test("q134 triangles == brute-force reference on the small graph") {
    val li = Tables.lineitem(spark, sf)
    val got = Graph.triangles(spark, li, topN = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver brute force over the canonical edge set
    val edges = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { basket =>
        val ps = basket.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val tris = for {
      (a, b) <- edges.toSeq
      c <- adj.getOrElse(b, Set.empty)
      if adj.getOrElse(a, Set.empty).contains(c)
    } yield (a, b, c)
    val perNode = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.map(_._3).distinct.toSeq == Seq(tris.size.toLong),
      s"total: got ${got.headOption.map(_._3)}, want ${tris.size}")
    got.foreach { case (node, n, _) =>
      assert(perNode(node) == n, s"node $node: got $n, want ${perNode(node)}")
    }
    assert(got.length == perNode.size, "every triangle-bearing node emitted")
  }

  // ------------------------------------------------------------------ q136

  test("q136 label propagation == driver-side k-round BFS-min reference") {
    val li = Tables.lineitem(spark, sf)
    val got = Graph.labelPropagation(spark, li).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent driver path: adjacency map + k rounds of synchronous min
    val edges = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { basket =>
        val ps = basket.map(_._2).toSeq.distinct
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }.toSet
    val nodes = edges.map(_._1) ++ edges.map(_._2)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lbl = nodes.map { v =>
        v -> (adj.getOrElse(v, Iterable.empty).map(lbl) ++ Seq(lbl(v))).min
      }.toMap
    }
    assert(got == lbl, "synchronous min-label rounds must agree")
    // on this dense graph 4 rounds reach the component minimum everywhere
    val comp = got.values.toSet
    assert(comp.forall(c => got(c) == c), "component labels are fixed points")
  }

  // ------------------------------------------------------------------ q137

  test("q137 data card: entropy/majority bounds and volume accounting") {
    val docs = Tables.documents(spark, sf01)
    val rows = Datasets.dataCard(docs).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count(), "doc accounting closes")
    rows.foreach { r =>
      val ent = r.getDouble(4); val maj = r.getDouble(5)
      assert(ent >= -1e-12 && ent <= math.log(5.0) + 1e-12, s"entropy $ent")
      assert(maj >= 0.2 - 1e-12 && maj <= 1.0 + 1e-12, s"majority $maj")
    }
    val totalToks = Tables.documents(spark, sf01)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalToks, "token accounting closes")
  }

  // ------------------------------------------------------------------ q138

  test("q138 bursts == driver-side z-score reference; top-10 is global") {
    val ev = Tables.events(spark, sf01)
    val rows = Analytics.burstDetect(ev).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    val perMin = ev.groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    val n = perMin.length.toDouble
    val mean = perMin.map(_._2).sum / n
    val variance = perMin.map(t => t._2.toDouble * t._2).sum / n - mean * mean
    val want = perMin.map { case (m, c) => (m, c, (c - mean) / math.sqrt(variance)) }
      .sortBy(t => (-t._3, t._1.getTime)).take(10)
    assert(rows.map(_._1).toSeq == want.map(_._1).toSeq, "same top minutes")
    rows.zip(want).foreach { case ((_, cg, zg), (_, cw, zw)) =>
      assert(cg == cw); assert(math.abs(zg - zw) < 1e-9)
    }
  }

  test("q138 constant per-minute rate emits no bursts (no NaN/Inf z)") {
    import spark.implicits._
    // 5 minutes × exactly 3 events each — true variance 0; the double
    // E[X²]−mean² cancellation must not surface NaN rows, it must yield
    // an EMPTY result (constant rate ⇒ nothing to rank)
    val ev = (0 until 5).flatMap { m =>
      (0 until 3).map(i => (java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:0$i"), 1L))
    }.toDF("ts", "user_id")
    assert(Analytics.burstDetect(ev).collect().isEmpty,
      "zero-variance stream must produce no burst rows (not NaNs)")
  }

  // ------------------------------------------------------------------ q135

  test("q135 JL projection preserves pairwise distances within JL tolerance") {
    val embs = Tables.embeddings(spark, sf01)
    val proj = EmbeddingStats.jlProject(embs).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2).toDouble / (1L << 20))
      }
    val orig = embs.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)
    }.toMap
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ids = orig.keys.toSeq.sorted.take(30)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d0 = dist(orig(ids(i)), orig(ids(j))) if d0 > 1e-9
      dp = dist(proj(ids(i)).toArray, proj(ids(j)).toArray) / math.sqrt(16.0)
    } yield dp / d0
    // k=16 JL is loose; assert the ratio distribution is centered near 1
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean out of JL band")
    assert(ratios.count(r => r > 0.4 && r < 1.9).toDouble / ratios.length > 0.95,
      s"too many badly-distorted pairs")
  }

  test("q135 plan: projection is scan-local — no exchange before the sort") {
    val df = EmbeddingStats.jlProject(Tables.embeddings(spark, sf01))
    val plan = df.queryExecution.executedPlan.toString
    // the only hash exchange allowed is the loader's REPARTITION_BY_NUM
    // input spreading; the projection itself must add none (the final
    // rangepartitioning exchange is the output sort)
    val opExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") &&
        !l.contains("REPARTITION_BY_NUM"))
      .toSeq
    assert(opExchanges.isEmpty,
      s"JL projection must not shuffle: $opExchanges")
  }
}
