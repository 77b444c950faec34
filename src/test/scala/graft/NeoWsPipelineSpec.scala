package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.GraftSession
import graft.etl._
import graft.model.NeoWs

/** Local filesystem under a session-conf-only scheme — exists so the land
  * spec can prove BronzeIngest.land resolves schemes via the session Hadoop
  * conf rather than a bare `new Configuration()`. */
class GraftLandFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftland:///")
}

/** Reference-parity tests over the authored NeoWs fixtures (FIXTURES.md §A):
  * silver schema/values, edge semantics (first-approach-only, empty approach,
  * bad numerics, null dates, duplicate asteroids), gold star build, catalog. */
class NeoWsPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("neows-spec", cores = 4)
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
  val batchId = 1786500000L
  val procInstant = java.time.Instant.parse("2026-08-14T00:00:00Z")

  lazy val silverBasic =
    BronzeToSilver.transform(
      BronzeToSilver.readBronze(spark, fixture("feed_basic.json")),
      batchId, Some(procInstant)).cache()
  lazy val silverEdge =
    BronzeToSilver.transform(
      BronzeToSilver.readBronze(spark, fixture("feed_edge_cases.json")),
      batchId, Some(procInstant)).cache()

  override def afterAll(): Unit = spark.stop()

  test("silver schema matches FIXTURES.md DDL exactly") {
    val expected = Seq(
      "asteroid_id" -> "string", "neo_id" -> "string", "asteroid_name" -> "string",
      "magnitude" -> "double", "is_hazardous" -> "boolean", "is_sentry" -> "boolean",
      "diameter_min_km" -> "double", "diameter_max_km" -> "double",
      "diameter_min_m" -> "double", "diameter_max_m" -> "double",
      "jpl_url" -> "string",
      "approach_date" -> "date", "approach_datetime" -> "timestamp",
      "approaching_body" -> "string",
      "velocity_km_s" -> "double", "velocity_km_h" -> "double",
      "miss_distance_km" -> "double", "miss_distance_au" -> "double",
      "miss_distance_lunar" -> "double",
      "_processing_timestamp" -> "timestamp", "_processing_date" -> "date",
      "_source_system" -> "string", "_etl_batch_id" -> "bigint")
    assert(silverBasic.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq == expected)
  }

  test("silver flattens all feed days: one row per asteroid (F1 multi-day)") {
    assert(silverBasic.count() == 3)
    assert(silverBasic.select("asteroid_id").distinct().count() == 3)
  }

  test("silver values: numeric-string casts and MMM timestamp parse (F3/F4)") {
    val r = silverBasic.filter(col("asteroid_id") === "3542519").collect().head
    assert(r.getAs[Double]("velocity_km_s") === 18.1279360862)
    assert(r.getAs[Double]("miss_distance_au") === 0.3027469593)
    assert(r.getAs[java.sql.Timestamp]("approach_datetime").toInstant ==
      java.time.Instant.parse("2026-08-12T04:38:00Z"))
    assert(r.getAs[java.sql.Date]("approach_date").toString == "2026-08-12")
    assert(r.getAs[Boolean]("is_hazardous"))
    assert(r.getAs[String]("_source_system") == "NeoWs API")
    assert(r.getAs[Long]("_etl_batch_id") == batchId)
  }

  test("only the FIRST close approach survives (P2, reference :61)") {
    val r = silverEdge.filter(col("asteroid_id") === "9000001")
    assert(r.count() == 2) // appears twice in the fixture (dup asteroid)
    assert(r.select("approaching_body").distinct().collect().map(_.getString(0)).toSet == Set("Earth"))
    assert(r.select("velocity_km_s").distinct().collect().head.getDouble(0) == 10.5)
  }

  test("empty close_approach_data yields null approach columns") {
    val r = silverEdge.filter(col("asteroid_id") === "9000002").collect().head
    assert(r.isNullAt(r.fieldIndex("approach_date")))
    assert(r.isNullAt(r.fieldIndex("approaching_body")))
    assert(r.isNullAt(r.fieldIndex("velocity_km_s")))
  }

  test("unparseable numeric strings coerce to null (F4, pandas-coerce parity)") {
    val r = silverEdge.filter(col("asteroid_id") === "9000003").collect().head
    assert(r.isNullAt(r.fieldIndex("velocity_km_s")))
    assert(r.isNullAt(r.fieldIndex("miss_distance_km")))
    assert(r.getAs[Double]("velocity_km_h") == 50000.0) // sibling fields still parse
  }

  test("gold dims: dedup, null-date drop, deterministic surrogate keys (A1-A3)") {
    val g = SilverToGold.build(silverEdge)
    // dup asteroid 9000001 collapses
    assert(g.dimAsteroid.count() == 4)
    assert(g.dimAsteroid.filter(col("asteroid_id") === "9000001").count() == 1)
    // null approach dates dropped (9000002 empty, 9000004 missing date)
    assert(g.dimDate.collect().map(_.getAs[Int]("date_id")).toSet == Set(20260814))
    // body dim: content-hash ids — only Earth survives approach[0]; the id
    // is a pure function of the name (stable across batches/rebuilds)
    val bodies = g.dimCelestialBody.collect()
      .map(r => r.getAs[String]("approaching_body") -> r.getAs[Long]("celestial_body_id")).toMap
    assert(bodies.keySet == Set("Earth"))
    val again = SilverToGold.dimCelestialBody(silverEdge).collect()
      .map(r => r.getAs[String]("approaching_body") -> r.getAs[Long]("celestial_body_id")).toMap
    assert(bodies == again)
  }

  test("gold fact: left joins keep null-date rows; referential integrity (J1/J2)") {
    val g = SilverToGold.build(silverEdge)
    val fact = g.fact.cache()
    assert(fact.count() == 5) // one per silver row, including null-approach rows
    // every non-null date_id exists in dim_date
    val dateIds = g.dimDate.select("date_id").collect().map(_.getInt(0)).toSet
    val factDateIds = fact.select("date_id").na.drop().collect().map(_.getInt(0)).toSet
    assert(factDateIds.subsetOf(dateIds))
    // null date → null date_id (SQL join semantics, not pandas NaN-match)
    assert(fact.filter(col("date_id").isNull).count() == 2)
    // event ids deterministic across rebuilds
    val again = SilverToGold.build(silverEdge).fact
      .select("approach_event_id").collect().map(_.getLong(0)).sorted
    assert(fact.select("approach_event_id").collect().map(_.getLong(0)).sorted.sameElements(again))
  }

  test("end-to-end pipeline + catalog answers the reference demo query (C1/C4)") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val layout = Pipeline.Layout(wh)
    val res = Pipeline.runFromBronze(spark, fixture("feed_basic.json"), layout,
      processingDate = "2026-08-14", batchId = batchId)
    assert(res.tables == Seq("dim_asteroid", "dim_celestial_body", "dim_date", "fact_asteroid_approach"))
    // the reference's own demo query (gold_catalog.py:80-84)
    val demo = GoldCatalog.sql(spark,
      "SELECT asteroid_id, velocity_km_s, miss_distance_km FROM fact_asteroid_approach LIMIT 5")
    assert(demo.count() == 3)
    assert(GoldCatalog.showTables(spark).count() >= 4)
    assert(GoldCatalog.describe(spark, "fact_asteroid_approach").count() == 12)
    // silver partition on disk is hive-partitioned by _processing_date
    assert(res.silver.columns.contains("_processing_date"))
    // idempotent re-run of silver for the same day (dynamic overwrite)
    BronzeToSilver.write(
      BronzeToSilver.transform(
        BronzeToSilver.readBronze(spark, fixture("feed_basic.json")), batchId,
        Some(procInstant)), layout.silver)
    assert(spark.read.parquet(layout.silver).count() == 3)
  }

  test("explicit feed schema reads without inference and is date-key independent") {
    val raw = BronzeToSilver.readBronze(spark, fixture("feed_basic.json"))
    assert(raw.schema == NeoWs.feed)
  }

  test("land honors session fs.* conf by default (S3-creds bug class)") {
    // Register a scheme that exists ONLY in the session Hadoop conf. If
    // `land` built a bare `new Configuration()` (the round-4 defect), the
    // scheme would be unknown and the write would fail; resolving it proves
    // the default conf is the session's newHadoopConf().
    val tmp = Files.createTempDirectory("graft-land-conf").toFile
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftland.impl", classOf[GraftLandFs].getName)
    try {
      val dest = s"graftland://${tmp.getAbsolutePath}/bronze/JSON/doc.json"
      BronzeIngest.land("""{"ok":true}""", dest)
      val f = new java.io.File(tmp, "bronze/JSON/doc.json")
      assert(f.exists(), "landed file should exist via the session-registered scheme")
      assert(scala.io.Source.fromFile(f).mkString == """{"ok":true}""")
    } finally {
      spark.sparkContext.hadoopConfiguration.unset("fs.graftland.impl")
    }
  }
}
