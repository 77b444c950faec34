package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning, the pre-shuffle scan reducer Catalyst
  * itself uses for runtime row-level filtering (InjectRuntimeFilter wraps
  * join keys in xxhash64 and aggregates them into a BloomFilterAggregate;
  * same Catalyst expressions here, driven explicitly through the function
  * registry like the engine's other native expressions).
  *
  * Pattern: build a bloom filter over the SMALL side's join keys (one
  * aggregate → a few hundred KB binary), broadcast it, and filter the BIG
  * side's scan with might_contain BEFORE the shuffle/join. False positives
  * only cost wasted rows — the exact join downstream removes them — so the
  * final result is byte-identical to the unpruned plan, which is exactly
  * what the oracle asserts. At 100 TB this turns "shuffle every fact row"
  * into "shuffle the ~matching fraction".
  */
object BloomFunctions {

  /** Register bloom_agg / bloom_might_contain on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_agg",
      exprs => new BloomFilterAggregate(new XxHash64(Seq(exprs(0))), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), new XxHash64(Seq(exprs(1)))),
      "built-in")
  }

  /** Aggregate column: bloom filter (binary) over xxhash64(key). */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    call_function("bloom_agg", key, lit(expectedItems), lit(numBits))

  /** Predicate: bloom might contain xxhash64(key). */
  def mightContain(bloom: Column, key: Column): Column =
    call_function("bloom_might_contain", bloom, key)
}
