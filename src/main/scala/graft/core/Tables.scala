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

  /** Natural hash-partitioning key for the two corpus tables whose
    * consumers run heavy per-row compute (shingle/fingerprint expressions,
    * pairwise cosine) BEFORE any natural exchange — for those, scan
    * parallelism is the whole game. The relational facts
    * (lineitem/orders/events) are NOT spread: their pre-shuffle work is
    * cheap casts/partial-aggs, so an extra exchange costs more than the
    * single-threaded scan stage it parallelizes (measured at sf0.1:
    * q39 percentile partial buffers got 1.6x slower when force-spread). */
  private val spreadKeys: Map[String, String] = Map(
    "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** Parallelism floor for pathological file layouts. Parquet splits align
    * to row groups, so a single-row-group file scans as ONE task no matter
    * how many cores the cluster has — and everything before the first
    * exchange (partial aggregates, fingerprint/shingle expressions,
    * broadcast-join stream sides) runs single-threaded. When the scan
    * yields fewer partitions than the session's parallelism, insert one
    * hash exchange on the table's natural key: deterministic (no
    * round-robin local sort), skew-free (near-unique keys), and reusable —
    * downstream joins/groupBys on the same key satisfy their required
    * distribution without re-shuffling. On a healthy multi-file 100 TB
    * table the guard sees >= cores partitions and this is a no-op; the
    * driver-side partition-count probe plans the scan but runs no job. */
  private def spread(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key)) else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    spreadKeys.get(name).map(spread(raw, _)).getOrElse(raw)
  }

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
