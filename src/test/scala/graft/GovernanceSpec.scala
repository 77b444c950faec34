package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Governance

/** Round-9 governance operators (q160-q163). The corpus is PII-free, so
  * the q160 oracle only pins engine parity on zeros — the match and
  * redaction SEMANTICS are pinned here on PII-bearing fixtures against
  * driver-side java.util.regex references (the same engine family Spark
  * compiles the patterns with, and the subset chosen to scan identically
  * under RE2/DuckDB).
  */
class GovernanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("governance-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ------------------------------------------------------------------ q160

  test("q160: PII fixtures — counts, doc attribution, matched chars") {
    val docs = docsOf(Seq(
      (1L, "a", "contact bob.smith+x@mail.example.org or 555-123-4567 today"),
      (2L, "a", "server at 10.0.255.3 and 192.168.1.1 no mail here"),
      (3L, "b", "clean document with no identifiers at all"),
      (4L, "b", "two mails a@b.co c@d.io one phone 111.222.3333")))
    val got = Governance.piiScan(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // driver-side java.util.regex reference
    def count(pat: String, s: String): (Int, Int) = {
      val m = java.util.regex.Pattern.compile(pat).matcher(s)
      var n = 0; var chars = 0
      while (m.find()) { n += 1; chars += m.group().length }
      (n, chars)
    }
    val texts = Map(
      "a" -> Seq("contact bob.smith+x@mail.example.org or 555-123-4567 today",
        "server at 10.0.255.3 and 192.168.1.1 no mail here"),
      "b" -> Seq("clean document with no identifiers at all",
        "two mails a@b.co c@d.io one phone 111.222.3333"))
    texts.foreach { case (src, ts) =>
      val per = ts.map { t =>
        val e = count(Governance.EmailPat, t)
        val p = count(Governance.PhonePat, t)
        val i = count(Governance.Ipv4Pat, t)
        (e._1, p._1, i._1, if (e._1 + p._1 + i._1 > 0) 1 else 0,
          e._2 + p._2 + i._2)
      }
      val want = (per.map(_._1).sum.toLong, per.map(_._2).sum.toLong,
        per.map(_._3).sum.toLong, per.map(_._4).sum.toLong, per.map(_._5).sum.toLong)
      assert(got(src) == want, s"source $src: ${got(src)} != $want")
    }
    // the specific shape: source a = 1 email, 1 phone, 2 IPs, both docs hit
    assert(got("a") == ((1L, 1L, 2L, 2L, count(Governance.EmailPat, texts("a")(0))._2
      + count(Governance.PhonePat, texts("a")(0))._2
      + count(Governance.Ipv4Pat, texts("a")(1))._2)))
  }

  test("q160: redaction replaces every match and nothing else") {
    val red = docsOf(Seq(
      (1L, "a", "mail a@b.co phone 555-123-4567 ip 10.0.0.1 end")))
      .select(Governance.redactPii(col("text")).as("t")).head().getString(0)
    assert(red == "mail [EMAIL] phone [PHONE] ip [IP] end")
    val clean = docsOf(Seq((1L, "a", "nothing sensitive here")))
      .select(Governance.redactPii(col("text")).as("t")).head().getString(0)
    assert(clean == "nothing sensitive here")
  }

  test("q160: corpus runs PII-free (the oracle's zero case is real)") {
    val rows = Governance.piiScan(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0)
    }
  }

  // ------------------------------------------------------------------ q161

  test("q161: quotas sum EXACTLY to the budget; proportional within 1") {
    val q = Governance.langQuota(Tables.documents(spark, sf)).collect()
    assert(q.map(_.getLong(4)).sum == Governance.QuotaBudget)
    // largest-remainder property: every quota within 1 of the float share
    val t = q.map(_.getLong(2)).sum.toDouble
    q.foreach { r =>
      val share = Governance.QuotaBudget * r.getLong(2) / t
      assert(math.abs(r.getLong(4) - share) < 1.0 + 1e-9,
        s"${r.getString(0)}/${r.getString(1)}: quota ${r.getLong(4)} vs share $share")
    }
    // base never exceeds final quota; award is 0 or 1
    q.foreach(r => assert(r.getLong(4) - r.getLong(3) == 0L || r.getLong(4) - r.getLong(3) == 1L))
  }

  test("q161: skewed fixture apportionment matches hand computation") {
    // weights 70/20/10 with budget 200 over total 100: exact shares
    // 140/40/20 — no remainders, base == quota
    val docs = docsOf(Seq((1L, "a", "x" * 70), (2L, "b", "y" * 20), (3L, "c", "z" * 10)))
    val got = Governance.langQuota(docs)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got == Map("a" -> 140L, "b" -> 40L, "c" -> 20L))
    // remainder case: 3/3/1 over budget 5 → shares 15/7,15/7,5/7 →
    // base 2/2/0, leftover 1 goes to the largest remainder (source c: 5/7)
    val docs2 = docsOf(Seq((1L, "a", "xxx"), (2L, "b", "yyy"), (3L, "c", "z")))
    val got2 = Governance.langQuota(docs2, budget = 5L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got2 == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  // ------------------------------------------------------------------ q162

  test("q162: exact power-law fixture recovers its slope") {
    // freqs 64,32,16,8,4,2,1 at ranks 1..7: ln f = ln 64 − ln 2 · ln r/ln...
    // not an exact line in ln-ln (freq = 64·2^(1−r) is exponential in r,
    // not polynomial) — use the EXACT Zipf law f = 720 / r instead:
    // 720,360,240,180,144,120 → ln f = ln 720 − 1·ln r exactly; slope −1.
    val words = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"w$r"))
    val docs = docsOf(Seq((1L, "s", words.mkString(" "))))
    val row = Governance.zipfFit(docs).head()
    assert(row.getLong(1) == 6L)
    assert(math.abs(row.getDouble(2) - (-1.0)) < 1e-9, s"slope ${row.getDouble(2)}")
    assert(math.abs(row.getDouble(3) - math.log(720.0)) < 1e-9)
  }

  test("q162: corpus slopes are negative and finite") {
    val rows = Governance.zipfFit(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && r.getDouble(2) < 0.0,
        s"${r.getString(0)}: slope ${r.getDouble(2)}")
    }
  }

  // ------------------------------------------------------------------ q163

  test("q163: median/MAD match a driver-side reference (lower-median rule)") {
    val docs = Tables.documents(spark, sf)
    val got = Governance.robustStats(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val raw = docs.select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (src, rows) =>
      def lowerMedian(vs: Seq[(Long, Long)]): Long = { // (value, docId)
        val sorted = vs.sortBy(identity)
        sorted(((vs.size + 1) / 2) - 1)._1
      }
      val med = lowerMedian(rows.map(r => (r._3, r._2)).toSeq)
      val mad = lowerMedian(rows.map(r => (math.abs(r._3 - med), r._2)).toSeq)
      assert(got(src) == ((med, mad)), s"$src: ${got(src)} != ($med, $mad)")
    }
  }

  // ------------------------------------------------------------------ q194

  test("q194: Welch t against a hand-computed two-source fixture") {
    val docs = docsOf(Seq(
      (1L, "a", "x" * 10), (2L, "a", "x" * 12),
      (3L, "b", "x" * 20), (4L, "b", "x" * 22)))
    val got = Governance.welchT(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // source a: n=2 mean 11 var 2; rest: n=2 mean 21 var 2
    val se = 2.0 / 2 + 2.0 / 2
    val tRef = (11.0 - 21.0) / math.sqrt(se)
    val dofRef = se * se / (1.0 / 1 + 1.0 / 1)
    assert(math.abs(got("a")._1 - (-10.0)) < 1e-12)
    assert(math.abs(got("a")._2 - tRef) < 1e-12)
    assert(math.abs(got("a")._3 - dofRef) < 1e-12)
    assert(math.abs(got("b")._2 + got("a")._2) < 1e-12) // symmetric two-source case
  }

  // ------------------------------------------------------------------ q195

  test("q195: chi2 is exactly 0 under independence and n under perfect 2x2 association") {
    import spark.implicits._
    def d(rows: Seq[(Long, String, String)]) =
      rows.map { case (i, lang, src) => (i, "t", lang, src, 1L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val indep = d(Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"), (4L, "a", "y"),
      (5L, "b", "x"), (6L, "b", "x"), (7L, "b", "y"), (8L, "b", "y")))
    val ri = Governance.chi2Independence(indep).collect().head
    assert(ri.getDouble(4) == 0.0 && ri.getLong(3) == 1L)
    assert(ri.getDouble(5) == 0.0)
    val dep = d(Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"), (4L, "b", "y")))
    val rd = Governance.chi2Independence(dep).collect().head
    assert(math.abs(rd.getDouble(4) - 4.0) < 1e-9) // chi2 == n for perfect 2x2
    assert(math.abs(rd.getDouble(5) - 1.0) < 1e-9) // Cramer's V 1
  }
}
