package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins (SURVEY §4 / 100 TB posture).
  *
  * AQE's skew-join split handles sort-merge skew automatically; this utility
  * covers the case AQE cannot: a hash/broadcast-ineligible join where one key
  * dominates. The big (skewed) side gets a deterministic salt in [0, n);
  * the small side is exploded n times so every (key, salt) bucket joins —
  * the hot key's rows spread across n tasks instead of one.
  *
  * The salt derives from xxhash64 of a per-row distinguishing column (never
  * rand(): nondeterministic salts break retries/replays — a re-executed task
  * would re-salt differently and double- or drop-count rows).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `bigKey === smallKey`, salted n ways.
    * @param bigRowId a column on `big` that varies per row (any id/payload
    *                 column) — drives the deterministic salt. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 bigRowId: Column, n: Int,
                 joinType: String = "inner"): DataFrame = {
    require(n > 0)
    val salted = big.withColumn("__salt", pmod(xxhash64(bigRowId), lit(n.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"),
      joinType)
      .drop("__salt")
  }
}
