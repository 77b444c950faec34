package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Signals

/** Signal meta-analysis operators (q185–q188): exact fixtures for the
  * rank-correlation extremes, the Wilson closed form, centroid-nearest
  * prototypes, and readability counting.
  */
class SignalsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("signals-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  // ------------------------------------------------------------------ q185

  test("q185: perfect agreement gives rho=1, perfect inversion rho=-1") {
    import spark.implicits._
    val agree = Seq.tabulate(5)(i => ("s", i.toLong, i.toDouble, i.toDouble * 2))
      .toDF("source", "doc_id", "avg_logp", "quality_score")
    val invert = Seq.tabulate(5)(i => ("s", i.toLong, i.toDouble, -i.toDouble))
      .toDF("source", "doc_id", "avg_logp", "quality_score")
    assert(Signals.spearmanBySource(agree).collect().head.getDouble(2) == 1.0)
    assert(Signals.spearmanBySource(invert).collect().head.getDouble(2) == -1.0)
  }

  test("q185: real-corpus rho is bounded and defined per source") {
    val rows = Signals.signalRankCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getDouble(2)
      assert(rho >= -1.0 && rho <= 1.0, s"${r.getString(0)} rho=$rho")
    }
  }

  // ------------------------------------------------------------------ q186

  test("q186: Wilson interval matches the closed form and brackets the rate") {
    val rows = Signals.wilsonPassRates(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p == k / n)
      val z = Signals.WilsonZ
      val denom = 1.0 + z * z / n
      val center = p + z * z / (2.0 * n)
      val margin = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      assert(math.abs(lo - (center - margin) / denom) < 1e-12)
      assert(math.abs(hi - (center + margin) / denom) < 1e-12)
      assert(lo >= 0.0 - 1e-12 && hi <= 1.0 + 1e-12 && lo <= p && p <= hi)
    }
  }

  // ------------------------------------------------------------------ q187

  test("q187: the centroid-nearest vector wins with the exact distance") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0), (3L, Array(1.0f, 0.0f), 0),
      (4L, Array(5.0f, 5.0f), 1), (5L, Array(7.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Signals.labelPrototypes(embs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // label 0 centroid (1,0): vec 3 at distance 0
    assert(got(0)._2 == 3L)
    assert(math.abs(got(0)._3) < 1e-9)
    // label 1 centroid (6,5): both at distance 1; tie broken by vec_id
    assert(got(1)._2 == 4L)
    assert(math.abs(got(1)._3 - 1.0) < 1e-9)
  }

  // ------------------------------------------------------------------ q188

  test("q188: word/sentence/syllable counting and the FK chain on a fixture") {
    import spark.implicits._
    val docs = Seq((1L, "Hello world. It is good.", "en", "s", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Signals.readability(docs).collect().head
    assert(r.getLong(2) == 5L) // words
    assert(r.getLong(3) == 2L) // sentences (two "." runs)
    assert(r.getLong(4) == 6L) // vowel groups: e,o | o | I | i | oo
    val fk = 0.39 * (5.0 / 2.0) + 11.8 * (6.0 / 5.0) - 15.59
    assert(math.abs(r.getDouble(5) - fk) < 1e-9)
  }

  test("q188: sentence floor prevents div-by-zero on unpunctuated text") {
    import spark.implicits._
    val docs = Seq((1L, "no punctuation here at all", "en", "s", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Signals.readability(docs).collect().head
    assert(r.getLong(3) == 1L)
    assert(!r.isNullAt(5))
  }
}
