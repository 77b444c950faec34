package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{GraftSession, Skew}
import graft.operators.AsOfJoin

/** Property-based checks (SURVEY §5.4) for the operators whose semantics are
  * easiest to get subtly wrong: the as-of join and the salted join. Each
  * trial compares the distributed implementation against a naive in-memory
  * reference on small random inputs (seeded scalacheck generators). */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("prop-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genLeft = Gen.nonEmptyListOf(for {
    k <- Gen.choose(0, 5); t <- Gen.choose(0L, 100L)
  } yield (k, t))
  private val genRight = Gen.listOf(for {
    k <- Gen.choose(0, 5); t <- Gen.choose(0L, 100L); v <- Gen.choose(0, 1000)
  } yield (k, t, v))

  test("asofJoin == naive latest-at-or-before reference on random inputs") {
    import spark.implicits._
    val trials = samples(Gen.zip(genLeft, genRight), 6)
    assert(trials.nonEmpty)
    for (((left, right), i) <- trials.zipWithIndex) {
      // unique right (k, t): deterministic winner is q27's concern, not this
      val rightU = right.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toList
      val lds = left.zipWithIndex
        .map { case ((k, t), j) => (j.toLong, k, t) }
        .toDF("lid", "k", "t")
      val rds = if (rightU.isEmpty) Seq((-999, -999L, 0)).toDF("rk", "rt", "v").filter(lit(false))
                else rightU.toDF("rk", "rt", "v")
      val got = AsOfJoin.asofJoin(lds, rds, "k", "rk", "t", "rt", Seq("v"))
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
      val want = left.zipWithIndex.map { case ((k, t), j) =>
        val candidates = rightU.filter(r => r._1 == k && r._2 <= t)
        j.toLong -> (if (candidates.isEmpty) None
                     else Some(candidates.maxBy(_._2)._3))
      }.toMap
      assert(got == want, s"trial $i: left=$left right=$rightU")
    }
  }

  test("saltedJoin == plain join on random (skewed) inputs") {
    import spark.implicits._
    val trials = samples(Gen.zip(Gen.nonEmptyListOf(Gen.choose(0, 1000)), Gen.choose(1, 8)), 5)
    for (((vs, n), i) <- trials.zipWithIndex) {
      val big = vs.zipWithIndex
        .map { case (v, j) => (j.toLong, v % 3, v) } // heavy key skew
        .toDF("id", "k", "v")
      val small = (0 to 3).map(k => (k, s"dim_$k")).toDF("sk", "name")
      val plain = big.join(small, big("k") === small("sk"))
        .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val salted = Skew.saltedJoin(big, small, "k", "sk", col("id"), n)
        .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(salted == plain, s"trial $i (n=$n)")
    }
  }

  test("WordNgramList == sliding-window reference on random texts") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // texts with messy whitespace: runs of spaces/tabs/newlines, leading and
    // trailing padding, empty and single-token cases
    val genText = Gen.listOf(Gen.oneOf(
      Gen.oneOf("a", "bb", "ccc", "dddd"), Gen.oneOf(" ", "  ", "\t", "\n")))
      .map(_.mkString)
    val texts = samples(genText, 60) ++ Seq("", " ", "solo", "a b", "  a   b  c ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val got = df.select(col("id"),
          graft.functions.VectorFunctions.wordNgramList(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      for ((t, i) <- texts.zipWithIndex) {
        val toks = t.trim.split("\\s+")
        val want =
          if (toks.length < n) Seq.empty[String]
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(got(i.toLong) == want, s"n=$n text=${t.replace("\n", "\\n")}")
      }
    }
  }
}
