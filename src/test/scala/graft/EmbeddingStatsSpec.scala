package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.EmbeddingStats

/** Gram/covariance + outlier-score contracts (q115/q116).
  *
  * The operator's promise is exactness: integer-quantized sums make the
  * whole moment computation bit-deterministic at any parallelism. These
  * tests pin that against a naive driver-side reference, plus the scale
  * shape (no row-inflating explode anywhere in the plan — the aggregator
  * does the outer product in-place).
  */
class EmbeddingStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("embstats-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private val d = 64

  /** Driver-side reference: quantize, then naive O(n·d²) moment sums. */
  private def refMoments(embs: DataFrame): (Long, Array[Array[Long]], Array[Long]) = {
    val vecs = embs.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.floor(x.toDouble * 1048576.0).toLong))
    val g = Array.ofDim[Long](d, d)
    val s = new Array[Long](d)
    vecs.foreach { v =>
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { g(i)(j) += v(i) * v(j); j += 1 }
        s(i) += v(i)
        i += 1
      }
    }
    (vecs.length.toLong, g, s)
  }

  test("q115: exact Gram longs and derived cov match naive reference") {
    val embs = Tables.embeddings(spark, sf)
    val (n, g, s) = refMoments(embs)
    val rows = EmbeddingStats.gramMatrix(spark, embs).collect()
    assert(rows.length == d * (d + 1) / 2)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == g(i)(j), s"gram($i,$j)")
      val nD = n.toDouble
      val cov = (g(i)(j).toDouble - s(i).toDouble * s(j).toDouble / nD) / nD / 1099511627776.0
      assert(r.getDouble(3) == cov, s"cov($i,$j) must be bit-identical")
    }
  }

  test("q115/q116 are partitioning-independent (exact integer sums)") {
    val embs = Tables.embeddings(spark, sf)
    val a = EmbeddingStats.gramMatrix(spark, embs).collect().toSeq
    val b = EmbeddingStats.gramMatrix(spark, embs.repartition(7)).collect().toSeq
    assert(a == b)
    val oa = EmbeddingStats.outlierScores(spark, embs).collect().toSeq
    val ob = EmbeddingStats.outlierScores(spark, embs.repartition(7)).collect().toSeq
    assert(oa == ob)
  }

  test("q116: planted far-out vector gets the top outlier score") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val outlier = Seq((99999L, Array.fill(d)(5.0f)))
      .toDF("vec_id", "embedding")
    val scored = EmbeddingStats.outlierScores(spark, base.union(outlier))
      .orderBy(col("m_dist2").desc).collect()
    assert(scored.head.getLong(0) == 99999L, "planted vector must rank first")
    assert(scored.head.getDouble(1) > 10 * scored(1).getDouble(1),
      "and by a wide margin")
  }

  test("scale shape: no row-inflating explode in any moment plan") {
    val embs = Tables.embeddings(spark, sf)
    for (df <- Seq(EmbeddingStats.gramMatrix(spark, embs),
                   EmbeddingStats.outlierScores(spark, embs),
                   EmbeddingStats.labelMoments(spark, embs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"),
        s"moment plans must not explode the corpus:\n$plan")
    }
  }

  test("q120: per-label mean/variance match naive per-label reference") {
    val embs = Tables.embeddings(spark, sf)
    val byLabel = embs.select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Float](1).toArray.map(x => math.floor(x.toDouble * 1048576.0).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = EmbeddingStats.labelMoments(spark, embs).collect()
    assert(rows.length == byLabel.size * d)
    rows.foreach { r =>
      val (label, i, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
      val vs = byLabel(label)
      assert(n == vs.length)
      val sv = vs.map(_(i)).sum
      val svv = vs.map(v => v(i) * v(i)).sum
      val mean = sv.toDouble / n.toDouble / 1048576.0
      val variance = (svv.toDouble - sv.toDouble * sv.toDouble / n.toDouble) /
        n.toDouble / 1099511627776.0
      assert(r.getDouble(3) == mean && r.getDouble(4) == variance,
        s"label $label dim $i must be bit-identical to the exact-sum derivation")
    }
  }

  test("sketch mergeability: per-shard GramAggregator buffers merge to the global buffer") {
    // the property incremental corpus statistics rely on: moments of the
    // union == elementwise sum of per-shard moments, with NO history rescan
    val agg = new graft.functions.GramAggregator(4)
    val rnd = new scala.util.Random(7)
    val vecs = Array.fill(100)(Array.fill(4)(rnd.nextInt(2000).toLong - 1000L))
    val whole = vecs.foldLeft(agg.zero)(agg.reduce)
    val shards = vecs.grouped(17).map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = shards.reduce(agg.merge)
    assert(merged.toSeq == whole.toSeq)
  }
}
