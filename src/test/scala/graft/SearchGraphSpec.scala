package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Clustering, Graph, Search, Similarity}

/** Contracts for the corpus-search/mixture operators (q105-q107), PQ ANN
  * (q108) and PageRank (q109). */
class SearchGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("search-graph-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  // ------------------------------------------------------------------ q105

  test("q105 phrase search agrees with an independent position-join formulation") {
    val docs = Tables.documents(spark, sf01)
    val viaNgrams = Search.phraseSearch(docs, Seq("table", "part"))

    // independent reference: explode positions, self-join on adjacency —
    // a completely different plan shape than the scan-local n-gram count
    val post = docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "token")))
    val a = post.filter(col("token") === "table")
      .select(col("doc_id"), col("pos"))
    val b = post.filter(col("token") === "part")
      .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
    val ref = a.join(b, col("doc_id") === col("doc_b") && col("pos_b") === col("pos") + 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))

    val got = viaNgrams.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = ref.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"ngram path ${got.size} rows vs position-join ${want.size}")
    assert(got.nonEmpty, "fixture phrase must occur")
  }

  test("q105 counts overlapping occurrences with multiplicity") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b", "en", "s", 7L), (2L, "a b c", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Search.phraseSearch(docs, Seq("a", "a")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      "overlapping 'a a' bigrams in 'a a a' count twice; doc 2 excluded")
  }

  // ------------------------------------------------------------------ q106

  test("q106 temperature quotas: per-source selection == min(quota, n_docs), small domains kept") {
    val docs = Tables.documents(spark, sf01)
    val out = Search.temperatureMix(docs, total = 200)
    val perSource = out.groupBy(col("source"))
      .agg(count(lit(1)).as("picked"), first(col("quota")).as("quota"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, picked, quota) =>
      assert(picked == math.min(quota, counts(src)),
        s"$src picked $picked, quota $quota, available ${counts(src)}")
      assert(quota >= 1, "floor keeps every domain represented")
    }
    // temperature flattens: no domain exceeds its proportional share by
    // less than sqrt-scaling implies — the largest domain's quota must be
    // SMALLER than its raw proportional share of the total
    val nTotal = counts.values.sum
    val (bigSrc, bigN) = counts.maxBy(_._2)
    val bigQuota = perSource.find(_._1 == bigSrc).get._3
    assert(bigQuota.toDouble / 200 < bigN.toDouble / nTotal + 1e-9,
      "sqrt temperature must shrink the biggest domain's share")
  }

  test("q106 is reproducible at different parallelism") {
    val docs = Tables.documents(spark, sf01)
    val a = Search.temperatureMix(docs).collect().map(_.getLong(0)).toSet
    val b = Search.temperatureMix(docs.repartition(13)).collect().map(_.getLong(0)).toSet
    assert(a == b, "md5-keyed selection is partition-independent")
  }

  // ------------------------------------------------------------------ q107

  test("q107 vocab growth: empty checkpoints report 0, not null") {
    import spark.implicits._
    // doc-id span 3 < 10 → cp(1)..cp(2) fall below the smallest doc_id;
    // without .otherwise(0L) those checkpoints would surface as nulls.
    val tiny = Seq(
      (100L, "alpha beta", "s"), (101L, "beta gamma", "s"), (102L, "delta", "s")
    ).toDF("doc_id", "text", "source")
    val rows = Search.vocabGrowth(tiny).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("vocab")) &&
        !r.isNullAt(r.fieldIndex("n_docs")) &&
        !r.isNullAt(r.fieldIndex("tokens_seen")),
        s"checkpoint ${r.getInt(0)} leaked nulls: $r")
    }
    assert(rows.head.getAs[Long]("vocab") == 0L, "pre-corpus checkpoint is 0")
    assert(rows.last.getAs[Long]("vocab") == 4L, "k=10 covers the full corpus")
    assert(rows.last.getAs[Long]("tokens_seen") == 5L)
  }

  test("q107 vocab growth: monotone, exact endpoints") {
    val docs = Tables.documents(spark, sf01)
    val rows = Search.vocabGrowth(docs).collect()
    assert(rows.length == 10)
    val vocab = rows.map(_.getAs[Long]("vocab"))
    val seen = rows.map(_.getAs[Long]("tokens_seen"))
    val nDocs = rows.map(_.getAs[Long]("n_docs"))
    assert(vocab.zip(vocab.tail).forall { case (x, y) => x <= y }, "vocab monotone")
    assert(seen.zip(seen.tail).forall { case (x, y) => x <= y }, "tokens monotone")
    // k=10 checkpoint covers the whole corpus exactly
    val totalDocs = docs.count()
    val totalVocab = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .distinct().count()
    val totalToks = docs
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(nDocs.last == totalDocs)
    assert(vocab.last == totalVocab)
    assert(seen.last == totalToks)
  }

  // ------------------------------------------------------------------ q108

  test("q108 PQ: shape contract and deterministic re-run") {
    val embs = Tables.embeddings(spark, sf)
    val out = Clustering.pqTopK(spark, embs)
    val rows = out.collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.keySet == (0L until 10L).toSet, "one result set per query")
    perQuery.values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 10), "dense ranks 1..10")
    }
    val again = Clustering.pqTopK(spark, embs).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "PQ pipeline fully deterministic")
  }

  test("q108 PQ recall vs exact top-k is non-trivial") {
    val embs = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(spark, embs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Clustering.pqTopK(spark, embs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    // 16-code/16-dim codebooks on random vectors are a coarse quantizer;
    // the contract is "meaningfully better than random", not exactness —
    // random overlap of two 10-of-n_corpus sets is ~10/n_corpus ≈ 2%.
    assert(recall >= 0.2, f"PQ reconstruction recall $recall%.2f vs exact top-10")
  }

  // ------------------------------------------------------------------ q109

  test("q109 pagerank: mass conserved, all positive, deterministic") {
    val li = Tables.lineitem(spark, sf)
    val out = Graph.pagerank(spark, li)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(1)).sum
    // symmetric graph, no dangling nodes -> power method conserves mass
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass $total")
    assert(rows.forall(_.getDouble(1) > 0))
    // high-degree hubs must out-rank the minimum-rank node
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.max > ranks.min * 1.5, "rank spread reflects topology")
    spark.catalog.clearCache() // release the library-contract edge cache
  }
}
