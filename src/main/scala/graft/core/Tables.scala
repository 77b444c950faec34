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

  /** Natural hash-partitioning key per table, applied ONLY when the scan
    * yields fewer partitions than the session parallelism (see `spread`).
    * The corpus tables (documents/embeddings) run heavy per-row compute
    * (shingle/fingerprint expressions, pairwise cosine) before any natural
    * exchange, so scan parallelism is the whole game there. The fact
    * tables joined it in round 8: the generator now writes ONE row group
    * per file, which Spark cannot split — without the guard every
    * lineitem/orders/events consumer ran its entire pre-shuffle stage
    * (filters, partial aggregates, basket collect_sets) on one core
    * (measured: q45 funnel 0.24→6.5 s, q134 triangles 5.7→28 s at sf0.1).
    * On a healthy multi-row-group 100 TB layout the guard sees ≥ cores
    * scan partitions and stays a no-op, so the earlier counter-measurement
    * (q39's partial buffers 1.6× slower when force-spread over an already-
    * parallel scan) is not re-introduced. Dims (region..part) broadcast
    * everywhere and are never worth an exchange. */
  private val spreadKeys: Map[String, String] = Map(
    "documents" -> "doc_id",
    "embeddings" -> "vec_id",
    // keys chosen so the guard exchange is REUSABLE, not overhead: basket
    // builds and order joins cluster lineitem on l_orderkey (orders joins
    // co-partition on o_orderkey — same values, no second exchange), and
    // the events family (sessionize/funnel/retention/gap-fill) clusters on
    // user_id, so their windows/aggregates satisfy their required
    // distribution straight off the guard's exchange.
    "lineitem" -> "l_orderkey",
    "orders" -> "o_orderkey",
    "events" -> "user_id")

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
  private def spread(df: DataFrame, key: String, needed: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (needed) df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))
    else df
  }

  /** The scan-partition probe (`df.rdd.getNumPartitions`) plans the scan
    * and converts it to an RDD — pure driver work, but ~10-50 ms per call
    * and every query reloads its tables, so across a 150-query bench run
    * it is real seconds. The answer depends on (dir, table, session
    * parallelism) AND the files actually on disk — the driver regenerates
    * testdata between rounds, sometimes while a JVM lives on — so the memo
    * key carries a cheap file-listing signature (count + total length +
    * max mtime, pure metadata, no I/O) and a relayout invalidates the
    * cached decision instead of silently skipping a needed repartition. */
  private val spreadDecision =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Long), Boolean]()

  /** Metadata-only signature of the parquet path (file or directory):
    * changes whenever files are added/removed/rewritten. Unresolvable
    * paths (non-local schemes) sign as 0 — the memo then just behaves like
    * the round-8 layout-blind key. */
  private def listingSignature(path: String): Long = {
    try {
      val f = new java.io.File(path.stripPrefix("file:"))
      if (!f.exists()) 0L
      else {
        val files = if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty) else Array(f)
        files.foldLeft(files.length.toLong) { (acc, x) =>
          31L * acc + x.length() + x.lastModified()
        }
      }
    } catch { case _: Throwable => 0L }
  }

  /** Analyzed-DataFrame memo. `spark.read.parquet` eagerly resolves the
    * relation — driver-side file listing + a footer read for schema — on
    * EVERY call, and the bench/verify surface re-loads its tables per
    * query: across 248 queries that fixed cost is tens of seconds of the
    * bench's per-query floor (round-9: pass 1 blew the 420 s budget while
    * ~half its cost was planning, not execution). A DataFrame is an
    * immutable logical plan, so reusing one across queries of the same
    * session is exactly what a user holding `val lineitem = ...` does —
    * and what a metastore catalog does at cluster scale (schema from the
    * catalog, not per-query footer reads). Keyed by session identity
    * (plans are session-bound), dir/name, parallelism, and the same
    * metadata listing signature as `spreadDecision`, so a driver-side
    * testdata regeneration mid-JVM invalidates the entry instead of
    * serving a stale schema. */
  // keyed by SESSION IDENTITY (round-11, ADVICE): identity hash codes can
  // collide between a stopped test session and a live one in the same JVM
  // (serving a plan bound to the dead session), so the session object
  // itself is the key. NOT weak-keyed (round-12, ADVICE): the cached
  // DataFrames strongly reference their owning session
  // (Dataset.sparkSession), so a WeakHashMap's values would pin its own
  // keys and nothing would ever collect — instead, entries whose
  // session's SparkContext has stopped are EXPLICITLY evicted on every
  // load, which is the actual lifecycle of sbt-test multi-session runs
  // (each suite stops its context when done).
  private val frameMemo =
    new java.util.IdentityHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String, Int, Long), DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    val sig = listingSignature(s"$dir/$name.parquet")
    val perSession = frameMemo.synchronized {
      val dead = frameMemo.keySet.iterator
      while (dead.hasNext) if (dead.next().sparkContext.isStopped) dead.remove()
      var m = frameMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Long), DataFrame]()
        frameMemo.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(
      (dir, name, target, sig), _ => {
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        spreadKeys.get(name).map { key =>
          val needed = spreadDecision.computeIfAbsent((dir, name, target, sig),
            _ => raw.rdd.getNumPartitions < target)
          spread(raw, key, needed)
        }.getOrElse(raw)
      })
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `ts` normalization across generator vintages, always landing on a
    * session-UTC TIMESTAMP (LTZ) so downstream instant functions
    * (`unix_micros`, watermarks, stream-stream join bounds) resolve:
    *   - INT64 TIMESTAMP(NANOS) footers (with
    *     `spark.sql.legacy.parquet.nanosAsLong=true` they surface as long
    *     nanos): integer `div` to micros — no double rounding, matching
    *     DuckDB's nanos→micros truncation;
    *   - timestamp[us] without timezone (reads as TIMESTAMP_NTZ under
    *     Spark 4's `inferTimestampNTZ` default): reinterpret the wall
    *     clock in the session's UTC zone — identical micros, and the same
    *     naive wall clock DuckDB sees. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (the engine's SQL surface — the
    * Spark analog of the reference's DuckDB view catalog,
    * `/root/reference/src/gold_catalog.py:52-61`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { t =>
      val df = if (t == "events") events(spark, dir) else load(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
}
