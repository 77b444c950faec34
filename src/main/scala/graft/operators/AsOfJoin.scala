package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** As-of (temporal) join — an operator Spark lacks natively (SURVEY §2.3:
  * "no range/as-of joins in the reference"; standard in time-series engines).
  *
  * `asofJoin(left, right)`: for each left row, attach the latest right row
  * with the same key whose timestamp is <= the left timestamp.
  *
  * Implementation is the scalable union+window pattern, NOT a range join:
  * tag both inputs, union, then one window pass per key ordered by time
  * propagates the last-seen right-side payload onto left rows
  * (`last(ignoreNulls)` over unbounded-preceding). Cost: ONE shuffle on the
  * key — same as an equi-join — versus a non-equi range join's
  * broadcast-nested-loop blowup. Skewed keys salt/split via AQE like any
  * other window.
  *
  * Composition choice (a) from the build brief: built-ins express the whole
  * operator; no custom SparkPlan needed.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest-at-time row is attached)
    * @param leftKey   join key column name on left
    * @param rightKey  join key column name on right
    * @param leftTime  event-time column on left
    * @param rightTime event-time column on right
    * @param payload   right-side columns to carry (prefixed in output)
    * Ties (right.time == left.time) match, like DuckDB `ASOF JOIN ... ON
    * l.ts >= r.ts`; among equal right timestamps the last by tiebreak wins. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r0 = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    // align schemas: left payload slots are null on left rows and vice versa
    val rPayloadCols = payload.map(p => col(p).as(s"__p_$p"))
    val lNullPayload = payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p"))
    val lAligned = l.select(
      (Seq(col("__k"), col("__t"), col("__side")) ++ leftCols.map(col) ++ lNullPayload): _*)
    val rAligned = r0.select(
      (Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ rPayloadCols): _*)
    // right rows sort BEFORE left rows at equal time (__side 0 < 1) so a
    // same-timestamp right row is visible to the left row (ties match)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lAligned.unionByName(rAligned)
      .select((Seq(col("__side")) ++ leftCols.map(col) ++
        payload.map(p => last(col(s"__p_$p"), ignoreNulls = true).over(w).as(p))): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }

  // --------------------------------------------------------------------- //

  /** q27: each event joined to the user's latest order at event time
    * (events.user_id ↔ orders.o_custkey). */
  def q27(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
    // pre-dedupe equal (custkey, orderdate) rows so the as-of winner is
    // deterministic (max o_orderkey), mirroring the oracle's QUALIFY
    val dedupW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val ord = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")
    asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_asof_join" -> q27 _
  )

  /** DuckDB has a native ASOF JOIN — the perfect oracle for this operator.
    * Tiebreak: among equal (o_custkey, o_orderdate) the max o_orderkey wins
    * (made deterministic by pre-deduping the right side in both engines). */
  def oracles: Map[String, String] = Map(
    "q27_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |          ORDER BY o_orderkey DESC) AS rn FROM orders) t
        |  WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin
  )
}
