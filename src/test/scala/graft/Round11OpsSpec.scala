package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.{Dedup, Governance}

/** Round-11 late-wave operators: Fellegi–Sunter linkage scoring (q252),
  * positional duplicated-span coverage (q253), seeded ε-DP histogram
  * release (q254). Semantics pinned on constructed fixtures against
  * driver-side reference math; the cross-engine exactness of the full
  * corpus run is the oracle's job. */
class Round11OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("r11-ops-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  private def custOf(rows: Seq[(Long, Int, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (k, nat, seg, bal) =>
      (k, s"Customer#$k", nat, bal, seg)
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ------------------------------------------------------------------ q252

  test("q252: agreement patterns score and classify per Fellegi–Sunter") {
    // nation 1: A/B agree on all 3 fields (match), C agrees with A and B on
    // seg+bal only (possible x2), D disagrees with everyone (non-match x3)
    val cust = custOf(Seq(
      (10L, 1, "AUTO", 1500.0), // bal band 1, dig 0
      (20L, 1, "AUTO", 1600.0), // bal band 1, dig 0
      (31L, 1, "AUTO", 1700.0), // bal band 1, dig 1
      (42L, 1, "BLDG", 9500.0), // bal band 9, dig 2
      (7L, 2, "AUTO", 1500.0))) // lone record: no pair in its block
    val rows = Dedup.fellegiSunter(cust).collect()
    assert(rows.map(_.getAs[Any]("nation").toString) === Array("1"))
    val r = rows.head
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("n_match") === 1L)
    assert(r.getAs[Long]("n_possible") === 2L)
    assert(r.getAs[Long]("n_nonmatch") === 3L)
    // driver-side exact recompute from the same scaled-long weights
    val Seq((sa, sd), (ba, bd), (da, dd)) = Dedup.FsFields.map(f => Dedup.FsWeights(f._1))
    val wsum = (sa + ba + da) + 2L * (sa + ba + dd) + 3L * (sd + bd + dd)
    assert(r.getAs[Double]("avg_weight") === wsum.toDouble / (6.0 * 1.0e9))
  }

  test("q252: classification counts tile the pair set on real data") {
    val df = Dedup.fellegiSunter(
      graft.core.Tables.customer(spark, "/root/testdata/sf0.01")).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getAs[Long]("n_match") + r.getAs[Long]("n_possible") +
        r.getAs[Long]("n_nonmatch") === r.getAs[Long]("n_pairs"))
    }
  }

  // ------------------------------------------------------------------ q253

  test("q253: positional coverage unions duplicated spans, once per token") {
    val eight = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = docsOf(Seq(
      (1L, "s1", eight), // 8 tokens, its one gram duplicated with doc 2
      (2L, "s2", eight + " z"), // 9 tokens; positions 1-8 covered
      (3L, "s3", (1 to 10).map(i => s"u$i").mkString(" ")), // all unique
      (4L, "s4", eight + " " + eight))) // internal repeat: fully covered
    val got = Dedup.dupSpanCoverage(docs).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_fraction"))).toMap
    assert(got("s1") === ((8L, 8L, 1.0)))
    assert(got("s2") === ((9L, 8L, 8.0 / 9.0)))
    assert(got("s3") === ((10L, 0L, 0.0)))
    assert(got("s4") === ((16L, 16L, 1.0)))
  }

  test("q253: short docs (< 8 tokens) count tokens but never coverage") {
    val docs = docsOf(Seq(
      (1L, "s", "a b c"),
      (2L, "s", "a b c"))) // exact dup, but too short to form a span
    val r = Dedup.dupSpanCoverage(docs).collect().head
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Long]("dup_tokens") === 0L)
  }

  // ------------------------------------------------------------------ q254

  test("q254: seeded Laplace noise matches the driver-side inverse CDF") {
    val docs = docsOf((1 to 30).map(i => (i.toLong, s"src${i % 3}", s"doc $i")))
    val got = Governance.dpSourceCounts(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val counts = Map("src0" -> 10L, "src1" -> 10L, "src2" -> 10L)
    counts.foreach { case (src, n) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp:$src".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val k = java.lang.Long.parseLong(md5.take(15), 16) % 1048576L
      val u = (k.toDouble + 0.5) / 1048576.0
      val c = u - 0.5
      val noise = -1.0 * (if (c < 0) -1.0 else 1.0) *
        graft.functions.Pin.grid9(math.log(1.0 - 2.0 * math.abs(c)))
      assert(got(src) === n.toDouble + noise)
      assert(math.abs(got(src) - n.toDouble) <= 14.0) // |ln 2^-20| bound
    }
  }

  test("q254: release is deterministic across runs") {
    val docs = docsOf((1 to 20).map(i => (i.toLong, s"s${i % 4}", s"text $i")))
    val a = Governance.dpSourceCounts(docs).collect().toSeq
    val b = Governance.dpSourceCounts(docs).collect().toSeq
    assert(a === b)
  }

  // ------------------------------------------------------------------ q255

  test("q255: MRR equals the driver-recomputed mean of exact reciprocal ranks") {
    val embs = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = graft.operators.Evaluation.annMrr(spark, embs).collect()
    assert(rows.length === 10) // the pinned query set
    val truth = graft.operators.Similarity.bruteForceTopK(spark, embs, k = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    val fps = rows.map { r =>
      val rk = r.getAs[Long]("ivf_rank")
      assert(rk >= 0L && rk <= 10L)
      assert(r.getAs[Long]("true_nn") === truth(r.getAs[Long]("query_id")))
      val fp = if (rk > 0) 1000000000000L / rk else 0L
      assert(r.getAs[Double]("reciprocal_rank") === fp.toDouble / 1.0e12)
      if (rk === 1L) assert(r.getAs[Double]("reciprocal_rank") === 1.0)
      fp
    }
    val mrr = fps.sum.toDouble / fps.length.toDouble / 1.0e12
    rows.foreach(r => assert(r.getAs[Double]("mrr") === mrr))
  }

  // ------------------------------------------------------------------ q256

  /** Driver twin of the engine's h60-mod-10 split coin. */
  private def splitOf(id: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md5.take(15), 16) % 10 match {
      case b if b < 8 => "train"
      case 8 => "val"
      case _ => "test"
    }
  }

  test("q256: one exact-dup cluster leaks every crossing pair under doc-hash, zero under cluster-hash") {
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val ids = (1L to 40L).toSeq
    val docs = docsOf(ids.map(i => (i, "s", text)))
    val rows = Dedup.nearDupSplitAudit(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // all 40 docs are one cluster with canonical id 1
    val clusterSplit = splitOf("1")
    val cl = rows("cluster_hash")
    assert(cl.getAs[Long]("leaked_pairs") === 0L)
    val clCounts = Map("train" -> cl.getAs[Long]("train_docs"),
      "val" -> cl.getAs[Long]("val_docs"), "test" -> cl.getAs[Long]("test_docs"))
    assert(clCounts(clusterSplit) === 40L)
    assert(clCounts.values.sum === 40L)
    // doc-hash: counts and crossing pairs from the driver twin
    val s = ids.map(i => splitOf(i.toString))
    val dh = rows("doc_hash")
    assert(dh.getAs[Long]("train_docs") === s.count(_ == "train").toLong)
    assert(dh.getAs[Long]("val_docs") === s.count(_ == "val").toLong)
    assert(dh.getAs[Long]("test_docs") === s.count(_ == "test").toLong)
    val crossing = (for {
      i <- ids.indices; j <- ids.indices if i < j && s(i) != s(j)
    } yield 1).size.toLong
    assert(dh.getAs[Long]("leaked_pairs") === crossing)
    assert(crossing > 0L) // the fixture straddles, so the audit bites
  }

  test("q256: an all-unique corpus leaks nothing and both policies agree") {
    val docs = docsOf((1L to 12L).map(i =>
      (i, "s", (1 to 15).map(j => s"u${i}_$j").mkString(" "))))
    val rows = Dedup.nearDupSplitAudit(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val (cl, dh) = (rows("cluster_hash"), rows("doc_hash"))
    Seq("train_docs", "val_docs", "test_docs", "leaked_pairs").foreach { c =>
      assert(cl.getAs[Long](c) === dh.getAs[Long](c))
    }
    assert(cl.getAs[Long]("leaked_pairs") === 0L)
  }
}
