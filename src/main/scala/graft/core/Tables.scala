package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * One parquet file per table under `$dir/`. Reads are plain
  * `spark.read.parquet` so Catalyst's vectorized reader, filter pushdown and
  * column pruning all apply; at cluster scale these would be multi-file
  * directories and nothing here changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `ts` is INT64 TIMESTAMP(NANOS) in the parquet footer; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it reads as long nanos —
    * convert to a microsecond timestamp (integer `div`, no double rounding),
    * matching DuckDB's nanos→micros truncation. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (the engine's SQL surface — the
    * Spark analog of the reference's DuckDB view catalog,
    * `/root/reference/src/gold_catalog.py:52-61`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(t => load(spark, dir, t).createOrReplaceTempView(t))
}
