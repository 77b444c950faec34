package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{GraftSession, Tables}
import graft.operators.{Analytics, Curation, Relational}

/** Conservation laws for the distribution-shaped analytics — invariants the
  * row-hash oracle holds only implicitly: the distributions must tile their
  * input exactly (no row dropped or double-counted by the join/agg shapes). */
class AnalyticsInvariantsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("analytics-inv", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("q84: order-count distribution tiles customers and orders exactly") {
    val out = Relational.q84OrderDist(spark, sf).cache()
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      // only orders of existing customers survive the (inner-side of the)
      // left join; the synthetic data is FK-complete, assert that premise
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    val sums = out.agg(
      sum(col("custdist")).as("n_cust"),
      sum(col("c_count") * col("custdist")).as("n_ord")).head
    assert(sums.getLong(0) == nCust, "every customer in exactly one bucket")
    assert(sums.getLong(1) == nOrd, "every non-urgent order counted once")
    out.unpersist()
  }

  test("q98: cohort week 0 equals cohort size; retention never exceeds it") {
    val out = Analytics.q98Retention(spark, sf).cache()
    // week_k = 0 exists for every cohort (a user is active in their own
    // first week by construction)
    val base = out.filter(col("week_k") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    val violating = out.join(base, Seq("cohort_week"))
      .filter(col("n_users") > col("cohort_size"))
    assert(violating.count() == 0, "retained users cannot exceed the cohort")
    // cohorts tile the user base: sum of cohort sizes == distinct users
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(base.agg(sum(col("cohort_size"))).head.getLong(0) == nUsers)
    out.unpersist()
  }

  test("q96: shards tile the corpus (docs and chars conserved, shard in range)") {
    val out = Curation.q96ShardManifest(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val want = docs.agg(count(lit(1)), sum(col("n_chars"))).head
    val got = out.agg(sum(col("n_docs")), sum(col("total_chars"))).head
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1))
    assert(out.filter(col("shard") < 0 || col("shard") >= 16).count() == 0)
    out.unpersist()
  }
}
