package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.Classify

/** Trainable-filter contracts: the NB fit/score pair against an imperative
  * driver reference, exact parallelism invariance of the decimal-summed
  * scores, and the Gumbel-top-k resampler against a from-scratch
  * reimplementation of the weight + key arithmetic. */
class ClassifySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("classify-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  /** Two-lang fixture with a decisive vocabulary split plus shared filler,
    * so the expected argmax is computable by hand yet smoothing and priors
    * both matter (unbalanced classes, zero-count pairs). */
  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "en", "the cat sat on the mat"),
      (1L, "en", "the dog ate the bone"),
      (2L, "en", "cat and dog and mat"),
      (3L, "en", "the the the cat"),
      (4L, "de", "der hund und die katze"),
      (5L, "de", "die katze und der hund the"),
      (6L, "en", "bone mat cat dog"),
      (7L, "de", "der der die und katze hund")
    ).toDF("doc_id", "lang", "text")
  }

  /** Imperative multinomial-NB reference: counts in Maps, Laplace over the
    * joint vocab, ln-ratio scores, smallest-label tie-break. */
  private def referenceNb(rows: Seq[(Long, String, String)])
      : (Map[(String, String), Double], Map[Long, (String, Double)]) = {
    val toks = rows.map { case (id, l, t) => (id, l, t.trim.split("\\s+").toSeq) }
    val vocab = toks.flatMap(_._3).distinct.sorted
    val labels = rows.map(_._2).distinct.sorted
    val nC = labels.map(l => l -> toks.filter(_._2 == l).map(_._3.size).sum).toMap
    val nCt = (for {
      l <- labels; w <- vocab
    } yield (l, w) -> toks.filter(_._2 == l).flatMap(_._3).count(_ == w)).toMap
    val logLik = nCt.map { case ((l, w), n) =>
      (l, w) -> graft.functions.Pin.grid9(
        StrictMath.log((n + 1.0) / (nC(l).toDouble + vocab.size))) }
    val prior = labels.map(l =>
      l -> graft.functions.Pin.grid9(
        StrictMath.log(rows.count(_._2 == l).toDouble / rows.size))).toMap
    val preds = toks.map { case (id, _, ws) =>
      val scored = labels.map { l =>
        l -> (ws.map(w => logLik((l, w))).sum + prior(l)) }
      val best = scored.minBy { case (l, s) => (-s, l) }
      id -> best
    }.toMap
    (logLik, preds)
  }

  test("nb fit matches the imperative reference on every (label, token)") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (refLik, _) = referenceNb(rows)
    val got = Classify.fitModel(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got.keySet == refLik.keySet, "dense model covers labels x vocab exactly")
    got.foreach { case (k, v) =>
      assert(v == refLik(k), s"log_lik mismatch at $k") // bit-exact: same ln on same doubles
    }
  }

  test("nb predictions match the reference argmax (and its scores)") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (_, refPreds) = referenceNb(rows)
    val got = Classify.nbPredictions(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got.keySet == refPreds.keySet)
    got.foreach { case (id, (lab, score)) =>
      assert(lab == refPreds(id)._1, s"label mismatch doc $id")
      // decimal-summed Spark score vs naive double sum: equal to 1 ulp-ish
      assert(math.abs(score - refPreds(id)._2) < 1e-12, s"score mismatch doc $id")
    }
  }

  test("scores are bit-identical under repartitioning (decimal sums)") {
    val a = Classify.nbPredictions(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val b = Classify.nbPredictions(docs.repartition(7, col("doc_id"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("importance resampler reproduces the reference weights, keys, and cut") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val toks = rows.map { case (id, l, t) => (id, l, t.trim.split("\\s+").toSeq) }
    val vocab = toks.flatMap(_._3).distinct
    val tTok = toks.filter(_._2 == "en").flatMap(_._3)
    val bTok = toks.flatMap(_._3)
    val nT = tTok.groupBy(identity).map { case (w, xs) => w -> xs.size }
    val nB = bTok.groupBy(identity).map { case (w, xs) => w -> xs.size }
    def delta(w: String): Double =
      graft.functions.Pin.grid9(StrictMath.log(
        (nT.getOrElse(w, 0) + 1.0) / (tTok.size.toDouble + vocab.size))) -
        graft.functions.Pin.grid9(StrictMath.log(
          (nB(w) + 1.0) / (bTok.size.toDouble + vocab.size)))
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val ref = toks.map { case (id, l, ws) =>
      val logw = ws.map(w => BigDecimal(delta(w)).setScale(15, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val u = (h60(id.toString) + 0.5) / 1152921504606846976.0
      (id, l, logw, logw - graft.functions.Pin.grid9(
        StrictMath.log(-graft.functions.Pin.grid9(StrictMath.log(u)))))
    }.sortBy { case (id, _, _, key) => (-key, id) }.take(4)
    val got = Classify.importanceResample(docs, "en", 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got.map(_._1) == ref.map(_._1), "selected ids + order")
    got.zip(ref).foreach { case ((_, _, gw, gk), (_, _, rw, rk)) =>
      assert(math.abs(gw - rw) < 1e-12 && math.abs(gk - rk) < 1e-12)
    }
  }

  test("holdout eval with train == eval collapses to the self-eval metrics") {
    val self = Classify.classifierEval(docs).collect().map(_.toSeq).toSet
    val hold = Classify.holdoutEval(docs, docs).collect().map(_.toSeq).toSet
    assert(hold == self)
  }

  test("pr curve: thresholds rise, predicted-positives and recall fall monotonically") {
    val rows = Classify.prCurve(docs, "en").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == (1 to 9), "one row per decile")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, "thresholds non-decreasing")
      assert(a._3 >= b._3, "n_pred_pos non-increasing")
      assert(a._6 >= b._6, "recall non-increasing")
    }
    val nEn = docs.filter(col("lang") === "en").count()
    rows.foreach { case (_, _, npp, tp, p, r) =>
      assert(tp <= npp && tp <= nEn)
      assert(p >= 0.0 && p <= 1.0 && r >= 0.0 && r <= 1.0)
      assert(r == tp.toDouble / nEn)
    }
  }

  test("budget select: per-source greedy prefix of the score order") {
    val src = docs.withColumn("source",
      concat(lit("s"), (col("doc_id") % 2).cast("string")))
    // full ranking = selection under an unreachable budget
    val full = Classify.budgetSelect(src, "en", Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(full.length == 8, "unbounded budget keeps every doc")
    val budget = 8L
    val ref = full.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.toSeq.sortBy { case (id, _, _, lo) => (-lo, id) }.takeWhile { r =>
        val keep = cum < budget; cum += r._3; keep }
    }.map(_._1).toSet
    val got = Classify.budgetSelect(src, "en", budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    assert(got.map(_._1).toSet == ref, "selected ids == driver greedy reference")
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).max < budget, "cum_before stays under budget")
    }
  }

  test("q122/q123 internal consistency: eval counts re-derive from predictions") {
    val preds = Classify.nbPredictions(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")).collect()
      .map(r => (r.getString(1), r.getString(3))) // (pred, true)
    val eval = Classify.classifierEval(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    eval.foreach { case (label, nTrue, nPred, tp) =>
      assert(nTrue == preds.count(_._2 == label))
      assert(nPred == preds.count(_._1 == label))
      assert(tp == preds.count(p => p._1 == label && p._2 == label))
    }
    assert(eval.map(_._2).sum == preds.length, "every doc evaluated once")
  }

  // ------------------------------------------------------------------ q190

  test("q190: calibration bins are consistent and a single-label corpus is perfectly calibrated") {
    import spark.implicits._
    // single label: softmax over one class -> conf exactly 1.0, bin 9, acc 1.0
    val mono = Seq(
      (0L, "en", "alpha beta"), (1L, "en", "beta gamma"), (2L, "en", "gamma alpha"))
      .toDF("doc_id", "lang", "text")
    val m = Classify.calibrationOf(mono).collect()
    assert(m.length == 1)
    assert(m.head.getLong(0) == 9L && m.head.getLong(1) == 3L)
    assert(m.head.getDouble(2) == 1.0 && m.head.getDouble(4) == 1.0)
    assert(m.head.getDouble(5) == 0.0)
    // two-lang fixture: bins partition the corpus; confidences live in their bin
    val c = Classify.calibrationOf(docs).collect()
    assert(c.map(_.getLong(1)).sum == 8L)
    c.foreach { r =>
      val (bin, n, conf, acc) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(4))
      assert(bin >= 0L && bin <= 9L)
      assert(conf >= bin / 10.0 - 1e-9 && (bin == 9L || conf < (bin + 1) / 10.0 + 1e-9))
      assert(acc >= 0.0 && acc <= 1.0 && n > 0)
      assert(math.abs(r.getDouble(5) - math.abs(acc - conf)) < 1e-12)
    }
  }

  test("q251 LOSO influence: removing a label-noise source helps, removing the signal source hurts") {
    import spark.implicits._
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16).toDouble / 1152921504606846976.0
    }
    val ids = (1L to 5000L)
    val trainIds = ids.filter(u(_) < 0.7).take(8)
    val evalIds = ids.filter(u(_) >= 0.8).take(3)
    val rows =
      // src_good carries the real signal for both labels
      Seq((trainIds(0), "src_good", "aa", "alpha alpha"),
        (trainIds(1), "src_good", "aa", "alpha alpha"),
        (trainIds(2), "src_good", "bb", "beta beta"),
        (trainIds(3), "src_good", "bb", "beta beta"),
        // src_noise mislabels alpha text as bb (pure label noise) —
        // heavy enough that BOTH the bb prior and p(alpha|bb) beat the
        // clean signal: score(bb) > score(aa) on the alpha eval docs
        (trainIds(4), "src_noise", "bb", "alpha alpha"),
        (trainIds(5), "src_noise", "bb", "alpha alpha"),
        (trainIds(6), "src_noise", "bb", "alpha alpha"),
        (trainIds(7), "src_noise", "bb", "alpha alpha"),
        // held-out test split (source has no train docs, so it is not ablated)
        (evalIds(0), "src_eval", "aa", "alpha alpha"),
        (evalIds(1), "src_eval", "aa", "alpha alpha"),
        (evalIds(2), "src_eval", "bb", "beta beta"))
    val docs = rows.toDF("doc_id", "source", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Classify.sourceInfluence(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == Set("src_good", "src_noise"))
    val (_, accNoNoise, accFull, infNoise) = got("src_noise")
    val (_, accNoGood, _, infGood) = got("src_good")
    // full model: noise doubles the bb prior, so alpha docs flip to bb ->
    // only the beta doc is right
    assert(math.abs(accFull - 1.0 / 3.0) < 1e-12)
    // dropping the noise source restores perfect accuracy
    assert(accNoNoise == 1.0 && infNoise < 0.0)
    // dropping the signal source leaves only mislabeled evidence: nothing
    // scores right (unscored docs count as wrong - fixed denominator)
    assert(accNoGood == 0.0 && infGood > 0.0)
  }
}
