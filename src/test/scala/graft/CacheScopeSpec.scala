package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CacheScope, GraftSession}
import graft.operators.Curation

/** Cache-lifetime contract (VERDICT r4 item 8): library-internal caches are
  * registered with CacheScope, so a caller composing corpus-scale operators
  * repeatedly in one session can release them deterministically — storage
  * memory must NOT grow across compositions. */
class CacheScopeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("cache-scope-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  /** Number of persisted RDD blocks-holders currently registered — the
    * observable storage-memory footprint. */
  private def persisted(): Int =
    spark.sparkContext.getPersistentRDDs.count { case (_, rdd) =>
      rdd.getStorageLevel.useMemory || rdd.getStorageLevel.useDisk
    }

  test("composing curationPipeline twice shows no storage-memory growth") {
    spark.catalog.clearCache()
    val base = persisted()

    val n1 = CacheScope.scoped {
      Curation.curationPipeline(spark, sf).count()
    }
    assert(persisted() == base,
      s"caches leaked after first scoped composition: ${persisted()} vs $base")

    val n2 = CacheScope.scoped {
      Curation.curationPipeline(spark, sf).count()
    }
    assert(persisted() == base,
      s"caches leaked after second scoped composition: ${persisted()} vs $base")
    assert(n1 == n2, "composition must stay deterministic across runs")
    assert(n1 > 0)
  }

  test("scoped releases only its own caches; outer caches survive") {
    spark.catalog.clearCache()
    import spark.implicits._
    val outer = Seq(1, 2, 3).toDF("x").cache()
    outer.count()
    val before = persisted()
    CacheScope.scoped {
      graft.operators.Dedup.jaccardPairs(
        graft.core.Tables.documents(spark, sf)).count()
    }
    assert(persisted() == before, "inner operator caches must be released")
    assert(outer.storageLevel.useMemory, "user-managed caches must be untouched")
    outer.unpersist()
  }

  test("outside any scope behavior is unchanged (cache stays until cleared)") {
    spark.catalog.clearCache()
    val base = persisted()
    graft.operators.Dedup.jaccardPairs(
      graft.core.Tables.documents(spark, sf)).count()
    assert(persisted() > base, "un-scoped operator cache persists (documented)")
    spark.catalog.clearCache()
    assert(persisted() == base)
  }
}
