package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.functions.Sketches

/** The unified sketch algebra's monoid laws (round-9 stretch item): for
  * each of KMV / CMS / HLL, merging per-part sketch rows through
  * [[Sketches]] must equal sketching the union — the property every
  * consumer (batch overlap, streaming maintenance) relies on — plus the
  * estimator edge branches.
  */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("sketches-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private val rnd = new scala.util.Random(42)

  test("KMV: merge of per-part sketches == sketch of the union") {
    import spark.implicits._
    val k = 16
    val parts = Seq.fill(5)(Seq.fill(200)(rnd.nextLong().abs % (1L << 60)))
    // per-part sketches (k smallest distinct)
    val sketches = parts.map(_.distinct.sorted.take(k))
    val merged = sketches.map(s => Tuple1(s)).toDF("sk")
      .agg(Sketches.kmvMergeRows(col("sk"), k).as("m"))
      .head().getSeq[Long](0)
    val expected = parts.flatten.distinct.sorted.take(k)
    assert(merged.toSeq == expected)
    // pairwise form agrees with the rows form
    val pair = spark.range(1)
      .select(Sketches.kmvMerge2(
        typedLit(sketches(0)), typedLit(sketches(1)), k).as("m"))
      .head().getSeq[Long](0)
    assert(pair.toSeq == (sketches(0) ++ sketches(1)).distinct.sorted.take(k))
  }

  test("CMS: rows merge is elementwise add; HLL: elementwise max") {
    import spark.implicits._
    val cells = 8
    val grids = Seq.fill(4)(Seq.fill(cells)(rnd.nextInt(100).toLong))
    val cms = grids.map(Tuple1(_)).toDF("sk")
      .agg(Sketches.cmsMergeRows(col("sk"), cells).as("m"))
      .head().getSeq[Long](0)
    assert(cms.toSeq == (0 until cells).map(i => grids.map(_(i)).sum))
    val hll = grids.map(Tuple1(_)).toDF("sk")
      .agg(Sketches.hllMergeRows(col("sk"), cells).as("m"))
      .head().getSeq[Long](0)
    assert(hll.toSeq == (0 until cells).map(i => grids.map(_(i)).max))
    // identity: merging zero rows yields the monoid identity
    val empty = Seq.empty[Tuple1[Seq[Long]]].toDF("sk")
      .agg(Sketches.cmsMergeRows(col("sk"), cells).as("c"),
        Sketches.hllMergeRows(col("sk"), cells).as("h"))
      .head()
    assert(empty.getSeq[Long](0) == Seq.fill(cells)(0L))
    assert(empty.getSeq[Long](1) == Seq.fill(cells)(0L))
  }

  test("kmvEstimate: exact below k, (k-1)/(h_k/2^60) at k") {
    val k = 4
    val small = Seq(10L, 20L)
    val full = Seq(1L << 50, 1L << 51, 1L << 52, 1L << 53)
    val row = spark.range(1).select(
      Sketches.kmvEstimate(typedLit(small), k).as("a"),
      Sketches.kmvEstimate(typedLit(full), k).as("b")).head()
    assert(row.getDouble(0) == 2.0)
    val expected = (k - 1).toDouble / ((1L << 53).toDouble / math.pow(2.0, 60))
    assert(math.abs(row.getDouble(1) - expected) < 1e-9)
  }

  test("hllEstimate: linear-counting branch on sparse, raw branch when saturated") {
    val p = 4 // m = 16 for a hand-checkable case
    val m = 1 << p
    // sparse: 3 buckets used at rho=1 — raw is far below 2.5m => linear
    val sparse = Seq.fill(3)(1L) ++ Seq.fill(m - 3)(0L)
    val est = spark.range(1)
      .select(Sketches.hllEstimate(typedLit(sparse), p).as("e")).head().getDouble(0)
    val linear = m.toDouble * math.log(m.toDouble / (m - 3).toDouble)
    assert(math.abs(est - linear) < 1e-9)
    // saturated: every bucket deep => raw branch (far above 2.5m)
    val dense = Seq.fill(m)(20L)
    val est2 = spark.range(1)
      .select(Sketches.hllEstimate(typedLit(dense), p).as("e")).head().getDouble(0)
    val remBits = 60 - p
    val scale = math.pow(2.0, remBits + 1)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sFull = m.toDouble * math.pow(2.0, remBits + 1 - 20)
    val raw = alpha * m * m * scale / sFull
    assert(math.abs(est2 - raw) / raw < 1e-12)
    assert(est2 > 2.5 * m)
  }
}
