package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{GraftSession, Tables}
import graft.operators.{Lakehouse, Mining, Similarity}

/** Invariants of the mining / lakehouse-maintenance operators beyond the
  * DuckDB hash gate: conservation laws (dedup survivors), algebraic
  * equivalence (incremental == full), bijectivity (Z-order), and retrieval
  * quality (rerank recall vs the exact engine). */
class MiningLakehouseSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("mine-spec", cores = 4)
  val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("q69: survivors + removed duplicates account for every document") {
    val docs = Tables.documents(spark, sf)
    val out = Mining.q69DedupCanonical(spark, sf).cache()
    val nDocs = docs.count()
    val survivors = out.count()
    val removed = out.agg(sum(col("n_dups_removed"))).head.getLong(0)
    assert(survivors + removed == nDocs)
    // every canonical doc with dups removed is the min id of its cluster:
    // its own id never appears as a removed member (removal = id > cluster min)
    assert(out.filter(col("n_dups_removed") < 0).count() == 0)
  }

  test("q75: incremental state+delta merge == full recompute (exact decimal)") {
    val merged = Lakehouse.q75IncrementalAgg(spark, sf)
    val full = Tables.orders(spark, sf).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(30,6)")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
    assert(merged.exceptAll(full).count() == 0 && full.exceptAll(merged).count() == 0)
  }

  test("q76: z-value is a bijection (distinct keys -> distinct zvals)") {
    val z = Lakehouse.q76ZOrder(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("zval")).distinct().cache()
    assert(z.select(col("zval")).distinct().count() ==
      z.select(col("l_partkey"), col("l_suppkey")).distinct().count())
    // interleave bound: zval < 2^32 for 16-bit inputs
    assert(z.filter(col("zval") >= (1L << 32) || col("zval") < 0).count() == 0)
  }

  test("compact: many small files -> size-targeted sorted files, same rows") {
    val li = Tables.lineitem(spark, sf)
    val dirIn = java.nio.file.Files.createTempDirectory("compact_in").toString
    val dirOut = java.nio.file.Files.createTempDirectory("compact_out").toString
    try {
      // simulate an append-heavy layout: 64 tiny files
      li.repartition(64).write.mode("overwrite").parquet(dirIn)
      def parquetFiles(d: String) =
        new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
      assert(parquetFiles(dirIn) == 64)
      Lakehouse.compact(spark, dirIn, dirOut, sortKey = "l_orderkey",
        targetBytes = 8L * 1024 * 1024)
      assert(parquetFiles(dirOut) < 8, s"still ${parquetFiles(dirOut)} files")
      val a = spark.read.parquet(dirIn)
      val b = spark.read.parquet(dirOut)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirIn))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirOut))
    }
  }

  test("schema evolution: appended column reads via mergeSchema, old rows null") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    try {
      import spark.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.parquet(s"$dir/day=1")
      Seq((3L, "c", 7.5), (4L, "d", 8.5)).toDF("id", "v", "score")
        .write.parquet(s"$dir/day=2")
      val unified = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(unified.columns.toSet == Set("id", "v", "score", "day"))
      assert(unified.count() == 4)
      assert(unified.filter(col("day") === 1 && col("score").isNull).count() == 2)
      assert(unified.filter(col("score").isNotNull).count() == 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("approx percentiles track the exact q39 values within 1%") {
    import graft.operators.{Analytics, Relational}
    val exact = Relational.q39Percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Analytics.approxPercentiles(Tables.lineitem(spark, sf)).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (mq, p25, p95) = exact(r.getString(0))
      def near(a: Double, b: Double) = math.abs(a - b) <= 0.01 * math.max(math.abs(b), 1.0)
      assert(near(r.getDouble(1), mq) && near(r.getDouble(2), p25) && near(r.getDouble(3), p95),
        s"approx ${r} vs exact ($mq,$p25,$p95)")
    }
  }

  test("q72: quantized-shortlist rerank recalls >=80% of exact top-10") {
    val exact = Similarity.bruteForceTopK(spark, Tables.embeddings(spark, sf))
      .select(col("query_id"), col("neighbor_id"))
    val approx = Mining.q72AnnRerank(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
    val hit = exact.intersect(approx).count()
    val total = exact.count()
    assert(hit.toDouble / total >= 0.8, s"recall ${hit.toDouble / total}")
  }

  test("q73: SCD2 intervals tile each customer's history without overlap") {
    val scd = Lakehouse.q73Scd2(spark, sf).cache()
    // version numbers are contiguous from 1 per customer
    val bad = scd.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), max(col("version")).as("vmax"), min(col("version")).as("vmin"))
      .filter(col("vmax") =!= col("n") || col("vmin") =!= 1)
    assert(bad.count() == 0)
    // intervals never invert (equal endpoints CAN occur: two same-timestamp
    // orders with different priorities tie-break by orderkey — a zero-length
    // version at the grain of the data), and exactly one open interval each
    assert(scd.filter(col("valid_to").isNotNull && col("valid_from") > col("valid_to")).count() == 0)
    val open = scd.filter(col("valid_to").isNull).groupBy(col("o_custkey")).count()
    assert(open.filter(col("count") =!= 1).count() == 0)
  }

  test("z-ordered write produces files with disjoint zval ranges (file pruning)") {
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    Lakehouse.writeZOrdered(Tables.lineitem(spark, sf), out, nFiles = 8)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zval")).as("lo"), max(col("zval")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
    }
  }

  test("q74: merge actions partition the key space correctly") {
    val m = Lakehouse.q74MergeUpsert(spark, sf).cache()
    val cust = Tables.customer(spark, sf).cache()
    val nBoth = cust.filter(col("c_nationkey") >= 10 && col("c_nationkey") < 13).count()
    val nInsert = cust.filter(col("c_nationkey") >= 13).count()
    val nRetain = cust.filter(col("c_nationkey") < 10).count()
    assert(m.filter(col("merge_action") === "updated").count() == nBoth)
    assert(m.filter(col("merge_action") === "inserted").count() == nInsert)
    assert(m.filter(col("merge_action") === "retained").count() == nRetain)
  }

  // ------------------------------ q292 Misra–Gries heavy hitters

  test("q292: MG candidates are a superset of every > n/(k+1) token") {
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      // many small partitions stress the per-partition eviction + merge
      .repartition(16)
      .cache()
    val n = toks.count()
    // k far below the vocabulary forces constant eviction churn, but
    // n/(k+1) must sit under the corpus's ~3.5% heavy-token plateau
    val k = 40
    val exact = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") * (k + 1) > lit(n))
      .select("token").collect().map(_.getString(0)).toSet
    assert(exact.nonEmpty, "fixture should have >n/41 tokens")
    val cands = Mining.mgCandidates(toks, k)
      .select("token").collect().map(_.getString(0)).toSet
    assert(exact.subsetOf(cands),
      s"MG guarantee violated: missing ${exact -- cands}")
    // the summary merge is bounded: at most k survivors per partition
    assert(cands.size <= 16 * k)
    toks.unpersist(); ()
  }

  test("q292: two-pass heavy hitters == brute-force exact groupBy") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val got = Mining.heavyHitters(docs, k = 200)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val toks = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
    val n = toks.count()
    val want = toks.groupBy("token").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") * 200 > lit(n))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }
}
