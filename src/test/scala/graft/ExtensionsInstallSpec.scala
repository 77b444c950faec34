package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftSession

/** GraftExtensions: engine functions reachable from pure SQL in a session
  * built with spark.sql.extensions. Separate suite: needs its own session. */
class ExtensionsInstallSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes engine functions to SQL") {
    // getOrCreate would silently reuse a prior suite's session (without the
    // extensions conf) — make sure none is active
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[2]").appName("ext-install")
        .config("spark.sql.extensions", "graft.GraftExtensions"),
      shufflePartitions = 2).getOrCreate()
    try {
      val r = spark.sql(
        """SELECT
          |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
          |  cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c0,
          |  size(word_shingles('a b c d', 3)) AS n_sh,
          |  size(hashed_word_shingles('a b c d', 3)) AS n_hsh
          |""".stripMargin).collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 0.0)
      assert(r.getInt(2) == 2)
      assert(r.getInt(3) == 2)

      // optimizer rule: a shingle projection over the (tiny) documents
      // relation gains a repartition below the project...
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .createOrReplaceTempView("docs_ext")
      val small = spark.sql(
        "SELECT doc_id, hashed_word_shingles(text, 3) AS sh FROM docs_ext")
      val smallPlan = small.queryExecution.optimizedPlan.toString
      assert(smallPlan.contains("Repartition"),
        s"rule did not fire on a small relation:\n$smallPlan")
      assert(small.count() > 0)
      // ...but a plain projection (no expensive expression) does not
      val cheap = spark.sql("SELECT doc_id, length(text) AS n FROM docs_ext")
      assert(!cheap.queryExecution.optimizedPlan.toString.contains("Repartition"))
      // ...and a relation above the size threshold is left alone
      spark.conf.set("spark.graft.parallelize.maxBytes", "1024")
      val big = spark.sql(
        "SELECT doc_id, hashed_word_shingles(text, 3) AS sh FROM docs_ext")
      assert(!big.queryExecution.optimizedPlan.toString.contains("Repartition"))
      spark.conf.unset("spark.graft.parallelize.maxBytes")
    } finally spark.stop()
  }
}
