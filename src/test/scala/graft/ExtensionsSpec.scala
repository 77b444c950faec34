package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{GraftSession, Tables}
import graft.functions.VectorFunctions
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Dedup / similarity / text-analysis operator semantics at sf0.001-0.01. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("ext-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("native cosine expression == builtin zip_with/aggregate composition") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sf).limit(50).cache()
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val both = a.join(b, col("ia") < col("ib"))
      .select(
        VectorFunctions.cosineSim(col("ea"), col("eb")).as("native"),
        VectorFunctions.cosineSimBuiltin(col("ea"), col("eb")).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("native WordShingles expression == builtin HOF shingle composition") {
    import graft.functions.{TextFunctions, VectorFunctions}
    VectorFunctions.register(spark)
    val docs = Tables.documents(spark, sf).limit(100)
    val both = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"),
        VectorFunctions.wordShingles(col("text"), 3).as("native"))
      .select(col("doc_id"), col("native"),
        TextFunctions.shinglesFromTokens(col("toks"), 3).as("hof"))
      // set equality: sort both (distinct arrays, order may differ)
      .filter(array_sort(col("native")) =!= array_sort(col("hof")))
    assert(both.count() == 0)
  }

  test("minhash+LSH pairs == exact jaccard pairs on this corpus") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(docs).select("doc_a", "doc_b").collect().toSet
    val lsh = Dedup.minhashPairs(docs).select("doc_a", "doc_b").collect().toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact)
    // typed-Aggregator signature path converges to the same verified pairs
    val typed = Dedup.minhashPairs(docs, typedAggregator = true)
      .select("doc_a", "doc_b").collect().toSet
    assert(typed == exact)
  }

  test("inlined single-block md5 == MessageDigest on 8-byte inputs") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val bytes = Array.fill(8)((rnd.nextInt(94) + 33).toByte) // printable
      md.reset()
      val d = md.digest(bytes)
      var l = 0L
      (0 until 8).foreach(b => l = (l << 8) | (d(b) & 0xffL))
      val want = l >>> 4
      def le(o: Int) = (bytes(o) & 0xff) | (bytes(o + 1) & 0xff) << 8 |
        (bytes(o + 2) & 0xff) << 16 | (bytes(o + 3) & 0xff) << 24
      val got = graft.functions.WinnowedFingerprint.md5h60of8(le(0), le(4))
      assert(got == want, s"md5 mismatch on ${new String(bytes)}")
    }
  }

  test("sorted_intersect_count == size(array_intersect) on fingerprints") {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val fp = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"), VectorFunctions.winnowFingerprint(col("text"), 8, 4).as("fp"))
      .filter(size(col("fp")) > 0)
    val mismatch = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        VectorFunctions.sortedIntersectCount(col("a.fp"), col("b.fp")).as("fast"),
        size(array_intersect(col("a.fp"), col("b.fp"))).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(mismatch.count() == 0)
  }

  test("simhash pairs cover most high-jaccard planted near-dups") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(docs, threshold = 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, maxHamming = 6)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash targets a SMALL hamming radius (web-dedup uses 3 on 64 bits —
    // Manku et al. WWW'07); a couple of SHORT planted near-dups land past
    // radius 6 (few tokens -> each edit flips many bits) and are the
    // minhash engine's to catch. Within the radius the output is EXACT
    // (chunk candidates are pigeonhole-complete for hamming<=7, and the
    // q23 DuckDB oracle is the brute-force all-pairs hamming join).
    val recall = exact.intersect(sim).size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.8, s"recall $recall; missed: ${exact.diff(sim)}")
  }

  test("LSH ANN candidates achieve usable recall vs brute force") {
    val embs = Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(spark, embs, queryMaxId = 10, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, embs, queryMaxId = 10, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall $recall collapsed") // approximate by design
    assert(lsh.size <= brute.size)
  }

  test("IVF ANN: nprobe cells achieve usable recall vs brute force") {
    val embs = Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(spark, embs, queryMaxId = 10, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, embs, queryMaxId = 10, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall $recall collapsed") // random vectors: cells carry little signal
    assert(ivf.size <= brute.size)
  }

  test("hard triplets == driver-side argmin/argmax reference; labels honored") {
    val embs = Tables.embeddings(spark, sf)
    val rows = Similarity.hardTriplets(spark, embs, queryMaxId = 10).collect()
    assert(rows.length == 10)
    // driver reference: exact cosine over collected vectors
    val all = embs.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val labels = all.map(v => v._1 -> v._3).toMap
    rows.foreach { r =>
      val qid = r.getLong(0)
      val (_, qv, ql) = all.find(_._1 == qid).get
      val scored = all.filter(_._1 != qid)
        .map { case (id, v, l) => (id, l, cos(qv, v)) }
      val (posId, _, posCos) =
        scored.filter(_._2 == ql).minBy { case (id, _, c) => (c, id) }
      val (negId, _, negCos) =
        scored.filter(_._2 != ql).maxBy { case (id, _, c) => (c, id) }
      assert(r.getLong(1) == posId && r.getLong(3) == negId,
        s"anchor $qid picked (${r.getLong(1)},${r.getLong(3)}), want ($posId,$negId)")
      assert(math.abs(r.getDouble(2) - posCos) < 1e-9)
      assert(math.abs(r.getDouble(4) - negCos) < 1e-9)
      assert(labels(r.getLong(1)) == ql && labels(r.getLong(3)) != ql)
      assert(math.abs(r.getDouble(5) - (negCos - posCos)) < 1e-9)
    }
  }

  test("hard triplets: anchors missing a positive or negative are dropped") {
    import spark.implicits._
    // label 7 is a singleton → anchor 0 has no positive; labels {1} cover
    // everything but anchor 1 → anchor 1 has no negative among ids >= 2.
    val embs = Seq(
      (0L, Seq(1f, 0f), 7), // singleton label: no positive anywhere
      (1L, Seq(0f, 1f), 1),
      (2L, Seq(1f, 1f), 1),
      (3L, Seq(0.5f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.hardTriplets(spark, embs, queryMaxId = 2).collect()
    // anchor 0 (no same-label neighbor) must vanish, matching the oracle's
    // inner join on rn=1; anchor 1 has both (pos among 2/3, neg = 0).
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L),
      s"degenerate anchor must be dropped, got ${rows.map(_.getLong(0)).mkString(",")}")
  }

  test("hard triplets plan: no window — one partial-aggregating groupBy") {
    val df = Similarity.hardTriplets(spark, Tables.embeddings(spark, sf))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "argmin/argmax must ride min/max aggregates")
    assert(p.contains("partial_min") || p.contains("partial"),
      s"expected map-side partial aggregation:\n$p")
  }

  test("IVF index on disk: pruned-partition read == in-memory path") {
    val embs = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    try {
      Similarity.writeIvfIndex(spark, embs, dir)
      val fromIndex = Similarity.ivfTopKFromIndex(spark, embs, dir)
      val inMemory = Similarity.ivfTopK(spark, embs)
      assert(fromIndex.exceptAll(inMemory).count() == 0 &&
        inMemory.exceptAll(fromIndex).count() == 0)
      // the probe-cell IN filter must prune at the partition level: the
      // executed scan lists PartitionFilters on cell, and reads fewer
      // partition directories than nlist
      fromIndex.write.format("noop").mode("overwrite").save()
      val scans = fromIndex.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains(dir))
      assert(scans.nonEmpty)
      assert(scans.exists(s => s.contains("PartitionFilters") && s.contains("cell")),
        s"no partition filter on cell in:\n${scans.mkString("\n")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("IVF index append: batch-incremental index == one-shot rebuild") {
    val embs = Tables.embeddings(spark, sf)
    // split at an id ABOVE nlist so the quantizer vectors land in the
    // initial build (the production invariant: the index is seeded with
    // the corpus the quantizer came from)
    val history = embs.filter(col("vec_id") < 400)
    val batch = embs.filter(col("vec_id") >= 400)
    val inc = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val full = java.nio.file.Files.createTempDirectory("ivf_full").toString
    try {
      Similarity.writeIvfIndex(spark, history, inc)
      Similarity.appendToIvfIndex(spark, batch, inc)
      Similarity.writeIvfIndex(spark, embs, full)
      // identical index contents (cell geometry recovered from the index
      // equals the one-shot quantizer), hence identical query results
      val a = spark.read.parquet(inc).select("neighbor_id", "cell")
      val b = spark.read.parquet(full).select("neighbor_id", "cell")
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
      val qa = Similarity.ivfTopKFromIndex(spark, embs, inc)
      val qb = Similarity.ivfTopKFromIndex(spark, embs, full)
      assert(qa.exceptAll(qb).count() == 0 && qb.exceptAll(qa).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(inc))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(full))
    }
  }

  test("exact dedup groups: empty at sf0.01 (no planted exact dups), keys stable") {
    assert(Dedup.exactDupGroups(Tables.documents(spark, sf)).count() == 0)
    val sf01 = "/root/testdata/sf0.1"
    val groups = Dedup.exactDupGroups(Tables.documents(spark, sf01))
    assert(groups.count() > 0) // sf0.1 has planted exact dups
    assert(groups.filter(col("doc_id") === col("keep_id") && col("n_dups") === 1).count() == 0)
  }

  test("winnowing fingerprints: identical normalized text == identical set; near-dups overlap") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val fp = (t: String) => Seq(t).toDF("text")
      .select(graft.functions.VectorFunctions.winnowFingerprint(col("text"), 8, 4).as("fp"))
      .collect().head.getSeq[Long](0)
    val a = fp("the quick brown fox jumps over the lazy dog again and again")
    val b = fp("THE  quick   brown fox jumps over the lazy dog again and again") // case+ws normalize
    assert(a == b)
    val c = fp("completely different content with nothing shared at all here")
    assert(a.toSet.intersect(c.toSet).size < a.size / 4)
    // planted near-dups in the corpus surface as high-overlap pairs
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.winnowPairs(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Dedup.jaccardPairs(docs, 0.95).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(pairs), s"missed: ${planted.diff(pairs).take(3)}")
  }

  test("language id is deterministic and covers every doc") {
    val out = TextAnalysis.langId(Tables.documents(spark, sf)).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("lang_guess").isNull).count() == 0)
  }
}
