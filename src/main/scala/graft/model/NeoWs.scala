package graft.model

import org.apache.spark.sql.types._

/** Explicit schema for the NASA NeoWs feed payload.
  *
  * The reference infers this schema on every read
  * (`/root/reference/src/etl/bronze_to_silver.py:34`), which makes the plan
  * depend on whatever dates happen to be in the document (the
  * `near_earth_objects` object is keyed BY DATE — one struct field per feed
  * day, `bronze_to_silver.py:39`). We instead declare `near_earth_objects` as
  * a map from date-string to asteroid array: the schema is date-independent,
  * the read needs no inference pass, and multi-day feeds work unchanged
  * (SURVEY.md §1.2, §7 "dynamic JSON key").
  *
  * Field set matches exactly what the silver select consumes
  * (`bronze_to_silver.py:38-78`); NeoWs encodes velocity/distance numerics as
  * JSON strings, preserved as StringType here and cast at silver.
  */
object NeoWs {

  val relativeVelocity: StructType = StructType(Seq(
    StructField("kilometers_per_second", StringType),
    StructField("kilometers_per_hour", StringType),
    StructField("miles_per_hour", StringType)))

  val missDistance: StructType = StructType(Seq(
    StructField("astronomical", StringType),
    StructField("lunar", StringType),
    StructField("kilometers", StringType),
    StructField("miles", StringType)))

  val closeApproach: StructType = StructType(Seq(
    StructField("close_approach_date", StringType),
    StructField("close_approach_date_full", StringType),
    StructField("epoch_date_close_approach", LongType),
    StructField("relative_velocity", relativeVelocity),
    StructField("miss_distance", missDistance),
    StructField("orbiting_body", StringType)))

  val diameterRange: StructType = StructType(Seq(
    StructField("estimated_diameter_min", DoubleType),
    StructField("estimated_diameter_max", DoubleType)))

  val asteroid: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("neo_reference_id", StringType),
    StructField("name", StringType),
    StructField("nasa_jpl_url", StringType),
    StructField("absolute_magnitude_h", DoubleType),
    StructField("is_potentially_hazardous_asteroid", BooleanType),
    StructField("is_sentry_object", BooleanType),
    StructField("estimated_diameter", StructType(Seq(
      StructField("kilometers", diameterRange),
      StructField("meters", diameterRange)))),
    StructField("close_approach_data", ArrayType(closeApproach))))

  /** Top-level feed document schema. */
  val feed: StructType = StructType(Seq(
    StructField("element_count", IntegerType),
    StructField("near_earth_objects", MapType(StringType, ArrayType(asteroid)))))

  /** Silver table columns in write order (SURVEY.md §1.4). */
  val silverColumns: Seq[String] = Seq(
    "asteroid_id", "neo_id", "asteroid_name",
    "magnitude", "is_hazardous", "is_sentry",
    "diameter_min_km", "diameter_max_km", "diameter_min_m", "diameter_max_m",
    "jpl_url",
    "approach_date", "approach_datetime", "approaching_body",
    "velocity_km_s", "velocity_km_h",
    "miss_distance_km", "miss_distance_au", "miss_distance_lunar",
    "_processing_timestamp", "_processing_date", "_source_system", "_etl_batch_id")
}

/** Typed rows for the gold star schema (SURVEY.md §1.5) — Dataset[T]
  * encoders give compile-time schema checks at the gold boundary. */
case class DimAsteroid(
    asteroid_id: String, neo_id: String, asteroid_name: String,
    magnitude: Option[Double], is_hazardous: Option[Boolean], is_sentry: Option[Boolean],
    diameter_min_km: Option[Double], diameter_max_km: Option[Double],
    diameter_min_m: Option[Double], diameter_max_m: Option[Double],
    jpl_url: String)

case class DimDate(
    date_id: Int, approach_date: java.sql.Date,
    year: Int, month: Int, day: Int, weekday: String)

case class DimCelestialBody(celestial_body_id: Long, approaching_body: String)

case class FactAsteroidApproach(
    approach_event_id: Long, asteroid_id: String,
    date_id: Option[Int], celestial_body_id: Option[Long],
    approach_datetime: Option[java.sql.Timestamp],
    velocity_km_s: Option[Double], velocity_km_h: Option[Double],
    miss_distance_km: Option[Double], miss_distance_au: Option[Double],
    miss_distance_lunar: Option[Double],
    _etl_batch_id: Long, _processing_timestamp: java.sql.Timestamp)
