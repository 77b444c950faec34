package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.GraftSession
import graft.etl.BronzeToSilver
import graft.model.NeoWs

/** The DataSource V2 connector must be value-identical to the DataFrame
  * path (readBronze + transform) on every fixture, and push column pruning
  * into the reader. */
class NeoWsSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("neows-source-spec", cores = 4)
  val fixtures = "src/test/resources/fixtures"

  override def afterAll(): Unit = spark.stop()

  private def viaSource(path: String): DataFrame =
    spark.read.format("graft.sources.NeoWsSource").load(path)

  private def viaEtl(path: String): DataFrame = {
    val dataCols = NeoWs.silverColumns.filterNot(_.startsWith("_"))
    BronzeToSilver.transform(BronzeToSilver.readBronze(spark, path), batchId = 0L)
      .select(dataCols.map(col): _*)
  }

  test("connector rows == DataFrame-path rows on the basic fixture") {
    val a = viaSource(s"$fixtures/feed_basic.json")
    val b = viaEtl(s"$fixtures/feed_basic.json")
    assert(a.schema == b.schema,
      s"schema drift:\n${a.schema.treeString}\nvs\n${b.schema.treeString}")
    assert(a.count() > 0)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("connector rows == DataFrame-path rows on the edge-case fixture") {
    val a = viaSource(s"$fixtures/feed_edge_cases.json")
    val b = viaEtl(s"$fixtures/feed_edge_cases.json")
    assert(a.count() > 0)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("column pruning reaches the reader (scan output = selected field)") {
    val df = viaSource(s"$fixtures/feed_basic.json").select(col("asteroid_id"))
    val scans = df.queryExecution.executedPlan.collectLeaves()
    assert(scans.nonEmpty)
    assert(scans.forall(_.output.map(_.name) == Seq("asteroid_id")),
      scans.map(_.output.mkString(",")).mkString(";"))
    assert(df.count() == viaEtl(s"$fixtures/feed_basic.json").count())
  }

  test("a directory of daily feeds scans as one partition per file") {
    val dir = java.nio.file.Files.createTempDirectory("feeds").toString
    try {
      for (d <- 1 to 3)
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$fixtures/feed_basic.json"),
          java.nio.file.Paths.get(s"$dir/feed_$d.json"))
      val df = viaSource(dir)
      assert(df.rdd.getNumPartitions == 3)
      assert(df.count() == 3 * viaEtl(s"$fixtures/feed_basic.json").count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
