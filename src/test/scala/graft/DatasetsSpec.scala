package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{GraftSession, Tables}
import graft.functions.KmvAggregator
import graft.operators.Datasets

/** Invariants of the dataset-assembly operators beyond the DuckDB hash
  * gate: sketch accuracy/mergeability, split stability, overlap symmetry
  * bounds. */
class DatasetsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("datasets-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("KmvAggregator: exact below k, within KMV error above, merge == one-shot") {
    val agg = new KmvAggregator(64)
    // distinct semantics: duplicates never inflate the sketch
    val small = (1L to 40L).flatMap(h => Seq(h, h))
      .foldLeft(agg.zero)((b, h) => agg.reduce(b, h * 12347L))
    assert(small.length == 40, "below k the sketch IS the distinct set")
    assert(small.toSeq == small.toSeq.sorted)
    // above k: estimate within the analytic KMV error (~1/sqrt(k-2) ≈ 13%
    // at k=64; allow 4 sigma) for a pseudo-uniform hash stream
    val n = 20000
    val hashes = (1 to n).map(i =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"doc$i").take(15), 16))
    val sketch = hashes.foldLeft(agg.zero)(agg.reduce)
    assert(sketch.length == 64)
    val est = 63.0 / (sketch.last.toDouble / 1152921504606846976.0)
    assert(math.abs(est - n) / n < 0.5, s"estimate $est too far from $n")
    // mergeability: sketch(union) == merge(sketch(a), sketch(b)) — the
    // property that makes the aggregate's partial buffers correct
    val (ha, hb) = hashes.splitAt(n / 3)
    val merged = agg.merge(ha.foldLeft(agg.zero)(agg.reduce),
      hb.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == sketch.toSeq)
  }

  test("q110: estimate tracks exact distinct across parallelism") {
    val docs = Tables.documents(spark, sf)
    val out = Datasets.kmvDistinct(docs).cache()
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("text")).as("exact")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      val (src, est) = (r.getString(0), r.getDouble(3))
      assert(math.abs(est - exact(src)) / exact(src) < 0.5,
        s"$src: est $est vs exact ${exact(src)}")
    }
    // partitioning-independence: same sketch from a repartitioned corpus
    val rep = Datasets.kmvDistinct(docs.repartition(13)).collect().toSeq
    assert(rep == out.collect().toSeq)
    out.unpersist()
  }

  test("q111: splits are exhaustive, disjoint, stable under corpus growth") {
    val docs = Tables.documents(spark, sf)
    val out = Datasets.trainSplit(docs).cache()
    assert(out.count() == docs.count())
    val bySplit = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val n = out.count().toDouble
    // md5-uniform: proportions near 0.7/0.1/0.2 (500 docs → generous 3-sigma)
    assert(math.abs(bySplit("train") / n - 0.7) < 0.08)
    assert(math.abs(bySplit("test") / n - 0.2) < 0.08)
    // growth stability: assignment on a PREFIX of the corpus agrees with
    // the full corpus assignment row-for-row (no rank-based splits)
    val prefix = Datasets.trainSplit(docs.filter(col("doc_id") < 200))
    val joined = prefix.as("p").join(out.as("f"), "doc_id")
      .filter(col("p.split") =!= col("f.split"))
    assert(joined.count() == 0, "a doc's split must never depend on other docs")
    out.unpersist()
  }

  test("q112: overlap rows are bounded and consistent with per-source gram counts") {
    val out = Datasets.sourceOverlap(Tables.documents(spark, sf)).cache()
    assert(out.count() > 0)
    // shared <= min(n_a, n_b); jaccard in (0, 1]; pairs are ordered (a < b)
    assert(out.filter(col("shared_grams") > least(col("n_a"), col("n_b"))).count() == 0)
    assert(out.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    assert(out.filter(col("source_a") >= col("source_b")).count() == 0)
    out.unpersist()
  }
}
