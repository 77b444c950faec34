package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.Profiling

/** Corpus-profiling operators (q172–q178): semantics pinned on fixtures
  * with driver-side scalar references; distribution-level invariants
  * (quota exactness, share flattening, symmetry bounds) checked on the
  * real sf0.01 corpus.
  */
class ProfilingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("profiling-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ------------------------------------------------------------------ q172

  test("q172: JSD of identical distributions is exactly 0; known pair matches scalar reference") {
    val docs = docsOf(Seq(
      (1L, "a", "x x y"), (2L, "b", "x x y"), // identical distributions
      (3L, "c", "x y y"))) // vs a: p(x)=2/3 vs 1/3
    val got = Profiling.jsDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", "b"))._2 == 0.0) // difference-paired lns cancel exactly
    assert(got(("a", "b"))._1 == 2L)
    // scalar JSD for p=(2/3,1/3), q=(1/3,2/3) over shared {x,y}
    def jsd(p: Seq[Double], q: Seq[Double]): Double =
      p.zip(q).map { case (pi, qi) =>
        val m = (pi + qi) / 2.0
        pi / 2.0 * math.log(pi / m) + qi / 2.0 * math.log(qi / m)
      }.sum
    val ref = jsd(Seq(2.0 / 3, 1.0 / 3), Seq(1.0 / 3, 2.0 / 3))
    assert(math.abs(got(("a", "c"))._2 - ref) < 1e-9)
    // symmetric-by-construction: only src_a < src_b pairs emitted
    assert(got.keys.forall { case (a, b) => a < b })
  }

  test("q172: unshared-mass correction — disjoint halves push toward ln 2") {
    val docs = docsOf(Seq(
      (1L, "a", "p p q"), (2L, "b", "p r r")))
    // shared {p}: pa=2/3, pb=1/3; unshared mass 1/3 and 2/3
    val got = Profiling.jsDivergence(docs).collect().head.getDouble(3)
    def t(pi: Double, qi: Double): Double = {
      val m = (pi + qi) / 2.0
      pi / 2.0 * math.log(pi / m) + qi / 2.0 * math.log(qi / m)
    }
    val ref = math.log(2.0) * ((1.0 - 2.0 / 3) + (1.0 - 1.0 / 3)) / 2.0 + t(2.0 / 3, 1.0 / 3)
    assert(math.abs(got - ref) < 1e-9)
    assert(got > 0.0 && got < math.log(2.0))
  }

  // ------------------------------------------------------------------ q173

  test("q173: class-size accounting on a planted QI distribution") {
    import spark.implicits._
    // classes: (1,A)x1, (1,B)x4, (2,A)x10
    val cust = (Seq.fill(1)((1, "A")) ++ Seq.fill(4)((1, "B")) ++ Seq.fill(10)((2, "A")))
      .zipWithIndex.map { case ((nk, seg), i) => (i.toLong, s"c$i", nk, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val got = Profiling.kAnonymity(spark, cust).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // k=2: only the singleton class is below
    assert(got(2) == ((3L, 15L, 1L, 1L, 1L)))
    // k=5: classes of size 1 and 4 below -> 5 rows at risk
    assert(got(5) == ((3L, 15L, 1L, 2L, 5L)))
    // k=20: everything below
    assert(got(20) == ((3L, 15L, 1L, 3L, 15L)))
    val frac5 = Profiling.kAnonymity(spark, cust).collect()
      .find(_.getInt(0) == 5).get.getDouble(6)
    assert(math.abs(frac5 - 5.0 / 15.0) < 1e-15)
  }

  // ------------------------------------------------------------------ q174

  test("q174: cluster-hash split leaks zero pairs; doc-hash split leaks nt*nv per cluster") {
    val dup = "identical payload text"
    val docs = docsOf(
      (1L to 6L).map(i => (i, "s", dup)) ++ // one 6-doc cluster
        Seq((7L, "s", "unique one"), (8L, "s", "unique two")))
    val got = Profiling.splitLeakage(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (clT, clV, clLeak) = got("cluster_hash")
    assert(clLeak == 0L)
    assert(clT + clV == 8L)
    // driver-side reference for the doc-hash policy
    val nt = (1L to 6L).count(i => md5hex(i.toString).head < '8')
    val expLeak = nt.toLong * (6L - nt)
    val (dT, dV, dLeak) = got("doc_hash")
    assert(dLeak == expLeak)
    assert(dT + dV == 8L)
    // the 6-doc cluster lands wholly on one side under cluster policy
    assert(clT == 0L || clV == 0L || clT % 1L == 0L) // counts well-formed
    val side = if (md5hex(md5hex(dup)).head < '8') "train" else "val"
    if (side == "train") assert(clT >= 6L) else assert(clV >= 6L)
  }

  // ------------------------------------------------------------------ q175

  test("q175: all-unique corpus fits beta=1, k=1 exactly") {
    // every token globally unique -> cumulative vocab == cumulative tokens
    val docs = docsOf(Seq(
      (1L, "s", "w1 w2"), (2L, "s", "w3 w4 w5"), (3L, "s", "w6"),
      (4L, "s", "w7 w8 w9 w10")))
    val r = Profiling.heapsFit(docs).collect().head
    assert(r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9) // beta
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9) // k = exp(0)
  }

  test("q175: sub-linear corpus yields beta < 1 on the real sf0.01 documents") {
    val rows = Profiling.heapsFit(graft.core.Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val beta = r.getDouble(2)
      assert(beta > 0.0 && beta < 1.0, s"${r.getString(0)} beta=$beta")
    }
  }

  // ------------------------------------------------------------------ q176

  test("q176: quotas sum exactly to the budget and temperature flattens shares") {
    val rows = Profiling.tempMixture(graft.core.Tables.documents(spark, sf)).collect()
    assert(rows.map(_.getLong(4)).sum == Profiling.TempBudget)
    val byNat = rows.sortBy(_.getDouble(2))
    // smallest natural share gains under alpha=0.5, largest loses
    assert(byNat.head.getDouble(3) > byNat.head.getDouble(2))
    assert(byNat.last.getDouble(3) < byNat.last.getDouble(2))
    // shares are valid distributions
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
  }

  // ------------------------------------------------------------------ q177

  test("q177: fertility ratios on a known fixture") {
    val docs = docsOf(Seq(
      (1L, "s", "hello world"), // 2 ws tokens, 2 subwords, 11 chars
      (2L, "s", "don't stop"))) // 2 ws tokens, don+'+t+stop = 4 subwords, 10 chars
    val r = Profiling.tokFertility(docs).collect().head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 2L) // docs
    assert(r.getLong(2) == 21L) // chars
    assert(r.getLong(3) == 4L) // ws tokens
    assert(r.getLong(4) == 6L) // subword tokens
    assert(math.abs(r.getDouble(5) - 21.0 / 4.0) < 1e-15)
    assert(math.abs(r.getDouble(6) - 6.0 / 4.0) < 1e-15)
  }

  // ------------------------------------------------------------------ q178

  test("q178: constant-length source has MAD 0 and no outliers; planted extreme is flagged") {
    val pad = "x" * 50
    val docs = docsOf(Seq(
      (1L, "flat", pad), (2L, "flat", pad), (3L, "flat", pad),
      // spread source: lengths 10,12,14,16,500 -> median 14, MAD 2, gate 6
      (4L, "spread", "y" * 10), (5L, "spread", "y" * 12), (6L, "spread", "y" * 14),
      (7L, "spread", "y" * 16), (8L, "spread", "y" * 500)))
    val got = Profiling.robustOutliers(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val flat = got("flat")
    assert(flat.getLong(3) == 0L) // mad
    assert(flat.getLong(4) == 0L) // outliers
    assert(flat.isNullAt(5) && flat.isNullAt(6))
    val sp = got("spread")
    assert(sp.getLong(2) == 14L) // median
    assert(sp.getLong(3) == 2L) // mad
    assert(sp.getLong(4) == 1L) // only the 500-char doc exceeds 3*MAD=6
    assert(sp.getLong(5) == 486L)
    assert(sp.getLong(6) == 8L)
  }
}
