package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.{EmbeddingStats, Governance, Mining, Profiling}

/** Round-9 fifth wave: blocklist audit (q227), Good-Turing smoothing
  * (q228), Chao1 richness (q229), HBOS outliers (q230), grouped
  * jackknife SE (q231).
  */
class Round9eOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round9e-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ------------------------------------------------------------------ q227

  test("q227: occurrence counts, doc-hit counts and rates per (source, pattern)") {
    val d = docsOf(Seq(
      (1L, "a", "spark hash spark"), // spark x2, hash x1
      (2L, "a", "nothing here"),
      (3L, "b", "merge sort merge merge")))
    val got = Governance.blocklistAudit(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(("a", "spark")) == ((2L, 1L, 2L, 0.5)))
    assert(got(("a", "hash")) == ((2L, 1L, 1L, 0.5)))
    assert(got(("a", "merge")) == ((2L, 0L, 0L, 0.0)))
    assert(got(("b", "merge")) == ((1L, 1L, 3L, 1.0)))
    assert(got(("b", "sort")) == ((1L, 1L, 1L, 1.0)))
    // full grid: every (source, pattern) pair is present, hit or not
    assert(got.size == 2 * Governance.Blocklist.size)
  }

  // ------------------------------------------------------------------ q228

  test("q228: counts-of-counts, r*, and unseen mass on a pinned corpus") {
    // one doc "a b c a b c": trigrams = [a b c, b c a, c a b, a b c]
    // -> N_1 = 2, N_2 = 1, N = 4
    val got = Mining.goodTuring(spark, docsOf(Seq((1L, "s", "a b c a b c"))))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString.toDouble),
          r.getDouble(4))).toMap
    assert(got(1L)._1 == 2L)                  // two singleton types
    assert(got(1L)._2.contains(1.0))          // r* = (1+1)*N_2/N_1 = 1
    assert(got(1L)._3 == 0.5)                 // P_0 = N_1/N = 2/4
    assert(got(2L)._1 == 1L)
    assert(got(2L)._2.isEmpty, "no N_3 row -> r* must be null, not wrong")
  }

  // ------------------------------------------------------------------ q229

  test("q229: bias-corrected Chao1 from V/F1/F2") {
    // source s: "a b c d" -> 2 trigram types, both singletons:
    // chao1 = 2 + 2*1/(2*(0+1)) = 3
    // source t: "x y z x y z x y z" -> types: [x y z]x3, [y z x]x2, [z x y]x2
    // -> V=3, F1=0, F2=2 -> chao1 = 3 (nothing rare -> estimate = observed)
    val got = Profiling.chao1(spark, docsOf(Seq(
      (1L, "s", "a b c d"), (2L, "t", "x y z x y z x y z"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got("s") == ((2L, 2L, 0L, 3.0, 2.0 / 3.0)))
    assert(got("t") == ((3L, 0L, 2L, 3.0, 1.0)))
  }

  // ------------------------------------------------------------------ q230

  test("q230: density-hole vector scores highest; scores match hand math") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.01f, 0.02f), 0),
      (3L, Array(0.03f, 0.01f), 0), (4L, Array(0.9f, 0.9f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = EmbeddingStats.hbosOutliers(embs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.head._1 == 4L, "the isolated vector must rank first")
    // vec 4: both dims land alone in bucket 7 -> 2*ln(4/1); others 2*ln(4/3)
    def grid(x: Double) =
      math.floor(graft.functions.Pin.grid9(x) * 1e12) / 1e12
    assert(math.abs(got.head._2 - 2 * grid(math.log(4.0))) < 1e-11)
    assert(math.abs(got(1)._2 - 2 * grid(math.log(4.0 / 3.0))) < 1e-11)
  }

  // ------------------------------------------------------------------ q231

  test("q231: jackknife SE and influence argmax on exact-grid fixtures") {
    // sources A{10,10} B{20,20} C{30,30}: theta_(A)=25, theta_(B)=20,
    // theta_(C)=15 -> SE = sqrt((2/3)*(25+0+25)) = sqrt(100/3)
    val docs = {
      import spark.implicits._
      Seq((1L, "A", 10L), (2L, "A", 10L), (3L, "B", 20L), (4L, "B", 20L),
        (5L, "C", 30L), (6L, "C", 30L))
        .map { case (id, src, nc) => (id, "t", "en", src, nc) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    }
    val r = Profiling.jackknifeSe(docs).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 20.0)
    assert(math.abs(r.getDouble(2) - math.sqrt(100.0 / 3.0)) < 1e-8)
    // |dev| ties between A and C -> source-name tie-break picks A
    assert(r.getString(3) == "A")
  }
}
