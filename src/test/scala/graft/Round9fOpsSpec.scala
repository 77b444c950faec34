package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.{Analytics, Classify, Curation, EmbeddingStats}

/** Round-9 sixth wave: matryoshka CKA (q232), segmented OLS (q233),
  * label-noise screen (q234), holdout perplexity (q235).
  */
class Round9fOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round9f-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  // ------------------------------------------------------------------ q232

  test("q232: variance split across prefix/suffix gives cka = 1/sqrt(2)") {
    import spark.implicits._
    // variance only in dim 0 (inside the 32-prefix) and dim 32 (outside),
    // equal magnitude, zero cross-cov: S_xy = c00^2, S_yy = c00^2,
    // S_xx = c00^2 + c_32^2 -> CKA = 1/sqrt(2)
    def vec(d: Int, v: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(d) = v; a
    }
    val embs = Seq(
      (1L, vec(0, 0.4f), 0), (2L, vec(0, -0.4f), 0),
      (3L, vec(32, 0.4f), 0), (4L, vec(32, -0.4f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = EmbeddingStats.ckaMatryoshka(spark, embs).collect().head
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2.0)) < 1e-6)
    assert(math.abs(r.getDouble(2) - 2.0 * r.getDouble(1)) < 1e-9,
      "S_xx must be exactly twice S_xy on this fixture")
  }

  // ------------------------------------------------------------------ q233

  private def dayEvents(counts: Seq[Int]): DataFrame = {
    import spark.implicits._
    val rows = for {
      (c, day) <- counts.zipWithIndex
      i <- 0 until c
    } yield new Timestamp(1700000000000L + day * 86400000L + i * 1000L)
    rows.toDF("ts")
  }

  test("q233: per-regime OLS around the detected break, exact") {
    // flat 5,5,5,5 then linear 10,12,14,16: cut lands after day 4;
    // segment 1: slope 0 intercept 5; segment 2: slope 2, intercept 0
    // (y = 2x at x = 5..8)
    val got = Analytics.segmentedRegression(
      spark, dayEvents(Seq(5, 5, 5, 5, 10, 12, 14, 16))).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got(1L) == ((4L, 0.0, 5.0)))
    assert(got(2L) == ((4L, 2.0, 0.0)))
  }

  // ------------------------------------------------------------------ q234

  test("q234: the planted mislabel is flagged; clean cells are not") {
    import spark.implicits._
    val en = "aa bb cc dd " * 5
    val fr = "xx yy zz ww " * 5
    val docs = ((1L to 6L).map(i => (i, en.trim, "en", "s", 20L)) ++
      (7L to 12L).map(i => (i, fr.trim, "fr", "s", 20L)) ++
      Seq((13L, en.trim, "fr", "s", 20L))) // english text labeled fr
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Classify.labelNoise(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(("fr", "en")) == ((1L, 1L)), "the planted doc is confidently flagged")
    assert(got(("en", "en"))._2 == 0L, "agreeing cells carry no flags")
    assert(got(("fr", "fr"))._2 == 0L)
  }

  // ------------------------------------------------------------------ q235

  // ------------------------------------------------------------------ q236

  test("q236: first-purchase-only conversions, exact LLR, coherent flags") {
    import spark.implicits._
    import graft.functions.TextFunctions
    // 40 users; user u first purchases on day u % 3 (plus a SECOND
    // purchase for user 1 that must not count)
    val base = 1700000000000L
    val rows = (1L to 40L).map(u =>
      (u, new Timestamp(base + (u % 3) * 86400000L), "purchase")) :+
      ((1L, new Timestamp(base + 5 * 86400000L), "purchase"))
    val ev = rows.toDF("user_id", "ts", "event_type")
    val got = Analytics.sprtReplay(spark, ev).collect()
    // arm split expected from the SAME h60 coin, computed independently
    val expB = (1L to 40L).toDF("user_id")
      .select(TextFunctions.h60(col("user_id").cast("string")).as("h"))
      .collect().count(_.getLong(0) >= (1L << 59)).toLong
    assert(got.length == 3, "3 distinct first-purchase days; the repeat adds none")
    val last = got.last
    assert(last.getLong(1) + last.getLong(2) == 40L)
    assert(last.getLong(2) == expB)
    got.foreach { r =>
      val llr = r.getLong(1) * math.log(0.8) + r.getLong(2) * math.log(1.2)
      assert(math.abs(r.getDouble(3) - llr) < 1e-12)
      assert(r.getBoolean(4) == (r.getDouble(3) >= math.log(19.0)))
      assert(r.getBoolean(5) == (r.getDouble(3) <= -math.log(19.0)))
    }
  }

  // ------------------------------------------------------------------ q237

  test("q237: always-repeating vs never-repeating terms score 1 and 0") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, "x x y", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.burstiness(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(4), r.getDouble(5))).toMap
    assert(got("x") == ((20L, 1.0, 1.0)))  // repeats in every containing doc
    assert(got("y") == ((20L, 0.0, 0.0)))  // never repeats
    assert(got.size == 2)
  }

  test("q235: fully-seen holdout has zero OOV and ppl = exp(-avg_logp)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, "aa bb aa bb", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.holdoutPerplexity(spark, docs).collect().head
    assert(r.getLong(0) > 0, "test split must be non-empty for ids 1..40")
    assert(r.getDouble(4) == 0.0, "identical corpus -> no unseen contexts")
    assert(r.getDouble(3) == graft.functions.Pin.grid9(math.exp(-r.getDouble(2))))
    assert(r.getDouble(3) > 1.0, "add-1 smoothing keeps ppl above 1")
  }
}
