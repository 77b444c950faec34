package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.{Classify, Governance, Multimodal, TextAnalysis}

/** Round-9 seventh wave: hapax concentration (q238), slice parity
  * (q239), trimmed/winsorized means (q240), scene cuts (q241).
  */
class Round9gOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("round9g-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  private def docsOf(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, lang, t) => (id, t, lang, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ------------------------------------------------------------------ q238

  test("q238: corpus-unique trigrams push a doc to rate 1; shared text to 0") {
    val d = docsOf(Seq(
      (1L, "s", "en", "a b c d"),       // both trigrams unique to doc 1
      (2L, "s", "en", "x y z w"),       // identical twin -> trigram count 2
      (3L, "s", "en", "x y z w")))
    val got = TextAnalysis.hapaxDocs(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 0L, 0.0)) && got(3L) == ((2L, 0L, 0.0)))
  }

  // ------------------------------------------------------------------ q239

  test("q239: the hard slice drives the parity gap and is named") {
    val en = ("aa bb cc dd " * 5).trim
    val fr = ("xx yy zz ww " * 5).trim
    val d = docsOf(
      (1L to 6L).map(i => (i, "s1", "en", en)) ++
        (7L to 12L).map(i => (i, "s2", "fr", fr)) :+
        ((13L, "s3", "en", fr))) // en-labeled doc with fr text
    val got = Classify.sliceParity(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5), r.getString(6)))
      .toMap
    val (nEn, slicesEn, minEn, gapEn, worstEn) = got("en")
    assert(nEn == 7L && slicesEn == 2L)
    assert(minEn == 0.0 && gapEn == 1.0 && worstEn == "s3")
    assert(got("fr")._4 == 0.0, "fr has one perfect slice -> zero gap")
  }

  // ------------------------------------------------------------------ q240

  test("q240: 10% trim drops the spike; winsor clamps it to the cut values") {
    val lens = (1L to 9L) :+ 100L
    val d = docsOf(lens.zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, "s", "en", "x" * n.toInt)
    })
    val r = Governance.trimmedStats(d).collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 9L) // lo/hi cut values
    assert(r.getDouble(4) == 14.5)                   // mean dragged by 100
    assert(r.getDouble(5) == 5.5)                    // trimmed
    assert(r.getDouble(6) == 5.5)                    // winsorized
  }

  // ------------------------------------------------------------------ q242

  test("q242: the mixed-language doc has the smallest posterior margin") {
    val en = ("aa bb cc dd " * 5).trim
    val fr = ("xx yy zz ww " * 5).trim
    val mixed = ("aa bb xx yy " * 5).trim // evenly split evidence
    val d = docsOf(
      (1L to 5L).map(i => (i, "s", "en", en)) ++
        (6L to 10L).map(i => (i, "s", "fr", fr)) :+
        ((11L, "s", "en", mixed)))
    val got = Classify.uncertaintySample(d).collect()
    assert(got.head.getLong(0) == 11L, "mixed doc must top the queue")
    got.foreach { r =>
      assert(r.getDouble(3) >= 0.0, "margin = top1 - top2 is non-negative")
      assert(r.getString(1) != r.getString(2))
    }
  }

  // ------------------------------------------------------------------ q243

  test("q243: sign_flip recomputes from the emitted slopes; flat source is null") {
    val d = docsOf(
      // source up: quality grows with length (clean text, more words)
      Seq((1L, "up", "en", ("w " * 10).trim), (2L, "up", "en", ("w " * 40).trim),
        (3L, "up", "en", ("w " * 80).trim),
        // source flat: constant length -> zero variance -> null slope
        (4L, "flat", "en", "a b c"), (5L, "flat", "en", "d e f")))
    val got = graft.operators.Signals.simpsonSlopes(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("flat").isNullAt(2) && got("flat").isNullAt(4))
    val up = got("up")
    assert(up.getDouble(2) > 0.0, "more words -> higher q31 score")
    val flip = up.getDouble(2) * up.getDouble(3) < 0
    assert(up.getBoolean(4) == flip)
  }

  // ------------------------------------------------------------------ q244

  test("q244: support/confidence/lift/leverage exact on a pinned basket set") {
    import spark.implicits._
    // orders: {1,2}, {1,2}, {1,3} -> pair (1,2) support 2, (1,3) dropped
    val li = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L), (30L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val got = graft.operators.Mining.assocRules(spark, li).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toMap
    assert(got.size == 2)
    assert(got((1L, 2L)) == ((2L, 2.0 / 3.0, 2.0 / 3.0, 1.0, 0.0)))
    assert(got((2L, 1L)) == ((2L, 2.0 / 3.0, 1.0, 1.0, 0.0)))
  }

  // ------------------------------------------------------------------ q241

  test("q241: a byte-content jump across the frame boundary is a cut") {
    val d = docsOf(Seq(
      (1L, "s", "en", "a" * 200 + "z" * 100), // frames 9700, 9700, 12200
      (2L, "s", "en", "b" * 50)))             // single frame, no cuts
    val got = Multimodal.sceneCuts(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.toString.toInt)))
      .toMap
    assert(got(1L) == ((3L, 1L, Some(2))))
    assert(got(2L) == ((1L, 0L, None)))
  }
}
