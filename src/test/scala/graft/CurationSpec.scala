package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{GraftSession, Tables}
import graft.operators.Curation

/** Invariants of the corpus-curation operators beyond the DuckDB hash gate:
  * packing continuity, containment bounds, ratio bounds, and mixture-budget
  * convergence. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("curation-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("q257: greedy cover picks the hand-computed sequence and stops early") {
    import spark.implicits._
    // shingle sets: d1 {abc,bcd,cde}, d2 {abc,bcd} (subset of d1),
    // d3 {xyz,yzw}, d4 {pqr}, d5 {abc} (subset), d6 none (<3 words)
    val docs = Seq(
      1L -> "a b c d e", 2L -> "a b c d", 3L -> "x y z w",
      4L -> "p q r", 5L -> "a b c", 6L -> "m n"
    ).toDF("doc_id", "text")
    val out = Curation.maxCoverage(docs).collect()
    // greedy: d1 (3), d3 (+2), d4 (+1); then every doc is covered → early
    // stop at 3 rows despite k = 5
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1, 1L, 3L, 3L), (2, 3L, 2L, 5L), (3, 4L, 1L, 6L)))
  }

  test("q257: equal-gain ties break to the smaller doc_id") {
    import spark.implicits._
    val docs = Seq(3L -> "a b c", 1L -> "d e f", 2L -> "a b c")
      .toDF("doc_id", "text")
    val out = Curation.maxCoverage(docs).collect()
    // all gains 1: round 1 goes to doc 1 (tie among 1/2/3 on gain? no —
    // every doc has gain 1, smallest id wins), round 2 to doc 2 (its
    // shingle differs from doc 1's), doc 3 is then fully covered
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 1L), (2, 2L)))
  }

  test("q257: sf0.01 gains non-increasing (submodularity) and totals exact") {
    val out = Curation.maxCoverage(Tables.documents(spark, sf)).collect()
    assert(out.length == 5)
    val gains = out.map(_.getLong(2)).toSeq
    assert(gains == gains.sorted.reverse, s"greedy gains must be non-increasing: $gains")
    val totals = out.map(_.getLong(3)).toSeq
    assert(totals == gains.scanLeft(0L)(_ + _).tail)
  }

  test("q86: bins are contiguous from 0 per lang and fill monotonically") {
    val out = Curation.q86PackSequences(spark, sf).cache()
    // per lang: bin ids form 0..max with no gaps (concat-and-chunk never
    // skips a window), and bins are non-decreasing in doc_id order
    val perLang = out.groupBy(col("lang"))
      .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"),
        countDistinct(col("bin")).as("n"))
    assert(perLang.filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
    val nonMono = out.withColumn("prev", lag(col("bin"), 1).over(w))
      .filter(col("prev").isNotNull && col("bin") < col("prev"))
    assert(nonMono.count() == 0)
    out.unpersist()
  }

  test("q87: containment is within (0,1] and eval ids are all < 100") {
    val out = Curation.q87Contamination(spark, sf).cache()
    assert(out.count() > 0) // planted near-dup pairs straddle the id split
    assert(out.filter(col("containment") <= 0 || col("containment") > 1.0).count() == 0)
    assert(out.filter(col("eval_id") >= 100 || col("train_id") < 100).count() == 0)
    out.unpersist()
  }

  test("q88: rep_ratio bounded in [0,1) and zero iff all trigrams distinct") {
    val out = Curation.q88Repetition(spark, sf).cache()
    assert(out.filter(col("rep_ratio") < 0 || col("rep_ratio") >= 1.0).count() == 0)
    assert(out.filter((col("n_distinct") === col("n_ngrams")) =!=
      (col("rep_ratio") === 0.0)).count() == 0)
    out.unpersist()
  }

  test("q96/writeShards: sharded write is complete and partition-pruned") {
    val docs = Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      val written = Curation.writeShards(docs, out)
      // every input doc landed in exactly one shard; totals conserved
      val manifest = Curation.q96ShardManifest(spark, sf)
        .select(col("shard"), col("n_docs"), col("total_chars"))
      assert(written.exceptAll(manifest).count() == 0 &&
        manifest.exceptAll(written).count() == 0)
      // shard column is a hive partition → a one-shard read prunes at the
      // file listing (PartitionFilters), touching 1/16th of the files
      val one = spark.read.parquet(out).filter(col("shard") === 3)
      val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PartitionFilters") && scan.contains("shard"))
      assert(one.count() ==
        manifest.filter(col("shard") === 3).head.getLong(1))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("q92/lmScore: oversized LM demotes the scoring join to a shuffle, same scores") {
    import spark.implicits._
    // adversarial vocab-explosion corpus: every bigram is unique, so the
    // LM has |corpus bigrams| entries — the shape where a forced broadcast
    // would OOM at scale
    val docs = (0 until 300).map(i => (i.toLong, s"tok${i}a tok${i}b tok${i}c"))
      .toDF("doc_id", "text")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // emulate scale: disable SIZE-based auto-broadcast (at 100 TB the LM's
    // size estimate exceeds any threshold) so only lmScore's explicit
    // hint decision is visible in the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val bcast = Curation.lmScore(spark, docs) // 600 entries < default limit
      val demoted = Curation.lmScore(spark, docs, lmBroadcastLimit = 100)
      assert(planOf(bcast).contains("BroadcastHashJoin"),
        "under the limit the scoring join must broadcast the LM")
      val p = planOf(demoted)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "over the limit the scoring join must shuffle on (w1,w2), not broadcast")
      assert(bcast.collect().toSeq == demoted.collect().toSeq,
        "join strategy must not change scores")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q97: span fractions bounded; planted near-dup docs score ~1") {
    val out = Curation.q97SpanDedup(spark, sf).cache()
    assert(out.filter(col("shared_frac") < 0 || col("shared_frac") > 1.0).count() == 0)
    assert(out.filter(col("n_shared") > col("n_spans")).count() == 0)
    // the corpus plants 25 near-dup pairs (jaccard >= 0.97): each member
    // shares most of its trigrams with its twin (a handful of edit sites
    // keep a few docs just under 0.9, so bound at 0.85)
    assert(out.filter(col("shared_frac") > 0.85).count() >= 50)
    out.unpersist()
  }

  test("curationPipeline: composed stages agree with their standalone operators") {
    import graft.operators.{Mining, TextAnalysis}
    val out = Curation.curationPipeline(spark, sf).cache()
    assert(out.count() > 0)
    // every emitted doc passed each gate the standalone operators define
    val okIds = TextAnalysis.quality(Tables.documents(spark, sf))
      .filter(col("quality_score") >= 0.5).select(col("doc_id"))
    val survivors = Mining.q69DedupCanonical(spark, sf).select(col("doc_id"))
    val mixed = Curation.q89MixtureSample(spark, sf).select(col("doc_id"))
    for ((gate, name) <- Seq((okIds, "quality"), (survivors, "dedup"), (mixed, "mixture")))
      assert(out.join(gate, Seq("doc_id"), "left_anti").count() == 0,
        s"pipeline emitted a doc failing the $name gate")
    // deterministic: a second run is identical
    val again = Curation.curationPipeline(spark, sf)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    // shard bounded; bins non-negative
    assert(out.filter(col("shard") < 0 || col("shard") >= 16 || col("bin") < 0).count() == 0)
    out.unpersist()
  }

  test("q101: incremental dedup == full pair set restricted to the batch") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val inc = Dedup.jaccardPairsIncremental(docs, newMin = 250L)
    val full = Dedup.jaccardPairs(docs).filter(col("doc_b") >= 250L)
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0)
    assert(inc.count() > 0)
    // and nothing history x history leaks through
    assert(inc.filter(col("doc_a") >= 250L && col("doc_b") < 250L).count() == 0)
  }

  test("q89: kept token budget per source lands near the smallest source") {
    val out = Curation.q89MixtureSample(spark, sf).cache()
    val budgets = Tables.documents(spark, sf)
      .select(col("source"), size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("bigint").as("n_tokens"))
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
    val minBudget = budgets.agg(min(col("src_tokens"))).head.getLong(0)
    val kept = out.groupBy(col("source")).agg(sum(col("n_tokens")).as("kept_tokens"))
    // md5-coin sampling at rate min/src converges to the min budget; with
    // only ~25 docs/source at sf0.01 allow a wide band (0.4x..1.6x)
    val off = kept.filter(col("kept_tokens") < minBudget * 0.4 ||
      col("kept_tokens") > minBudget * 1.6)
    assert(off.count() == 0, s"sources outside band: ${off.collect().mkString}")
    // determinism: second run is identical
    val again = Curation.q89MixtureSample(spark, sf)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("q94: length-band blocking shatters a skewed block without losing pairs") {
    import spark.implicits._
    // Skewed fixture: 600 names ALL sharing the first token ("acme"), spread
    // over lengths 10..70 — under first-token-only blocking this is one
    // quadratic 600-name block (~180k comparisons).
    val names = (0 until 600).map { i =>
      val pad = "x" * (i % 60)
      s"acme $pad${i / 60}"
    }.toDF("p_name")
    val maxDist = 4

    // 1) lossless: banded result == brute-force (no blocking at all)
    val banded = Curation.fuzzyJoinBlocked(names, maxDist)
    val all = names.as("a").join(names.as("b"), $"a.p_name" < $"b.p_name")
      .withColumn("dist", levenshtein($"a.p_name", $"b.p_name"))
      .filter($"dist" <= maxDist)
      .select($"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
        $"dist".cast("int").as("dist"))
    assert(banded.exceptAll(all).count() == 0 && all.exceptAll(banded).count() == 0)
    assert(banded.count() > 0, "fixture should contain close pairs")

    // 2) the (blk, band) key the shuffle hashes on caps the comparison set:
    // largest a-side block under banding vs the single 600-name block
    val w = maxDist + 1
    val blocks = names
      .select(split($"p_name", " ").getItem(0).as("blk"),
        floor(length($"p_name") / w).as("band"))
      .groupBy($"blk", $"band").count()
    val maxBlock = blocks.agg(max($"count")).head.getLong(0)
    assert(maxBlock <= 60,
      s"length banding should cap the skewed block (max block = $maxBlock)")
  }
}
