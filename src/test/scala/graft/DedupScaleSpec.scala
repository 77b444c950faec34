package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.GraftSession
import graft.operators.Dedup

/** Scale-path contract for embedding near-dup (VERDICT r4 item 1): above
  * the vector-count guard the operator must switch from the exact
  * broadcast product to the banded-sketch candidate join, and on a corpus
  * whose near-dups are real (high cosine) the two paths must return the
  * SAME pair set — approximation error lives at the threshold boundary,
  * not on actual duplicates. */
class DedupScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("dedup-scale-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  /** 80 seeded random base vectors (64-dim, like the embeddings table) plus
    * 20 exact duplicates at shifted ids. Random 64-dim pairs sit at
    * |cosine| < ~0.6, duplicates at 1.0 — a clean planted gap at 0.9. */
  private lazy val planted: DataFrame = {
    val rnd = new scala.util.Random(42)
    val base = (0L until 80L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val dups = (0L until 20L).map { i => (1000L + i, base(i.toInt)._2.clone()) }
    import spark.implicits._
    (base ++ dups).toDF("vec_id", "embedding")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("LSH path returns the exact pair set on planted duplicates") {
    val exact = pairSet(
      Dedup.embeddingNearDup(spark, planted, threshold = 0.9,
        exactMaxVectors = Long.MaxValue))
    val lsh = pairSet(
      Dedup.embeddingNearDup(spark, planted, threshold = 0.9,
        exactMaxVectors = 0L))
    assert(exact.size == 20, s"planted fixture should yield its 20 dup pairs, got ${exact.size}")
    assert(lsh == exact, "guarded LSH route must reproduce the exact pair set")
  }

  test("above the guard no side is broadcast and no all-pairs product exists") {
    val df = Dedup.embeddingNearDup(spark, planted, threshold = 0.9,
      exactMaxVectors = 0L)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "scale path must not broadcast the corpus into a nested-loop join")
    assert(!p.contains("CartesianProduct"))
  }

  test("below the guard the exact path is planned (the q24 oracle path)") {
    val p = Dedup.embeddingNearDup(spark, planted, threshold = 0.9)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "small corpora keep the exact broadcast product")
  }
}
