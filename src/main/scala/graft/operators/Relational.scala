package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** The engine's relational operator surface, exercised as named queries over
  * the driver testdata (TESTDATA.md star schema).
  *
  * Each query maps to rows of the SURVEY.md §2 inventory (reference file:line
  * cited per query). Spark-first discipline:
  *   - plans are declarative DataFrame expressions → Catalyst pushes filters
  *     and prunes columns into the parquet scans;
  *   - every double SUM is cast to decimal(30,6) per-row before aggregation so
  *     the result is order-independent (exact decimal accumulation) — at
  *     1000-executor scale partial-aggregate ordering is nondeterministic and
  *     raw double sums would not reproduce;
  *   - every query ends in a deterministic total order (unique sort key,
  *     explicit null ordering) so results are stable across engines/runs;
  *   - dims join via broadcast (Catalyst picks it under the threshold; these
  *     dims stay small at any scale because they are bounded categoricals).
  */
object Relational {

  /** Decimal-cast a double expression so SUM is exact and order-independent. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(30,6)")).cast("double")

  // ---------------------------------------------------------------------------
  // q01 — grouped aggregation (TPC-H Q1 shape). SURVEY §2.4: the reference has
  // only dropDuplicates as aggregate; this is the engine's general hash-agg
  // surface (partial+final, map-side combine — one shuffle on the group keys).
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // q02 — filter + projection; predicates and the 4-column read schema reach
  // the parquet scan (PushedFilters). SURVEY §2.2 (P1/P4/P6 generalized).
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_quantity") > lit(45.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // q03 — 3-way join + agg + top-N (TPC-H Q3 shape). orders⋈lineitem
  // shuffles on the order key. SURVEY §2.3 generalized.
  //
  // Broadcast policy (applies to every query here): explicit broadcast()
  // hints ONLY on relations bounded at any scale (nation/region/segment
  // dims, calendar dates, query/eval sets, vocab-bounded aggregates).
  // SF-PROPORTIONAL tables (customer, supplier, part) get NO hint — at
  // test scale the size threshold broadcasts them anyway, and at 100 TB,
  // where they are billions of rows, AQE demotes the join to a shuffle
  // instead of a forced-broadcast OOM.
  def q03TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === lit("BUILDING"))
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // q04 — left equi-join with null-producing right side (J1 expression form,
  // silver_to_gold.py:64): null keys/no-match → null columns, SQL semantics.
  def q04LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val rich = Tables.customer(s, dir).filter(col("c_acctbal") > lit(5000.0))
    o.join(rich, o("o_custkey") === rich("c_custkey"), "left")
      .select(col("o_orderkey"), col("c_name"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .orderBy(col("o_orderkey"))
  }

  // q05 — left-semi join (EXISTS). SURVEY §2.3 "free from Spark".
  def q05SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val r = Tables.lineitem(s, dir).filter(col("l_returnflag") === lit("R"))
    o.join(r, o("o_orderkey") === r("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  // q06 — left-anti join (NOT EXISTS).
  def q06AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= lit(48.0))
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  // q07 — deterministic keyed dedup (A1/A2, silver_to_gold.py:47): the
  // reference's dropDuplicates keeps an arbitrary row; we keep first-by-order
  // via row_number window so the result is reproducible at any parallelism.
  def q07DedupFirst(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data — order
    // by enough columns that the surviving row is fully determined.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === lit(1))
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"))
  }

  // q08 — window functions: rank + running sum per supplier. SURVEY §2.5
  // (none in reference; engine surface). Unique order key (shipdate, orderkey,
  // linenumber) → deterministic frames; decimal running sum → exact.
  def q08WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum(col("l_quantity").cast("decimal(30,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .filter(col("rn") <= lit(5))
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  // q09 — dim_date build (F9-F11, silver_to_gold.py:49-56): smart int key
  // yyyyMMdd, calendar attributes, weekday abbreviation (locale-pinned UTC).
  def q09DateDim(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(to_date(col("o_orderdate")).as("date_day"))
      .distinct()
      .select(
        date_format(col("date_day"), "yyyyMMdd").cast("int").as("date_id"),
        // emit as timestamp: DATE-typed outputs round-trip differently through
        // pandas (datetime.date vs datetime64) and would break the hash compare
        col("date_day").cast("timestamp").as("date_day"),
        year(col("date_day")).as("year"),
        month(col("date_day")).as("month"),
        dayofmonth(col("date_day")).as("day"),
        date_format(col("date_day"), "E").as("weekday"))
      .orderBy(col("date_id"))

  // q10 — deterministic surrogate-key dim (replaces A3's
  // monotonically_increasing_id, silver_to_gold.py:58-61, whose ids are
  // partition-dependent; dense_rank over the natural key is reproducible).
  def q10SurrogateDim(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_mktsegment")).distinct()
      .select(
        dense_rank().over(Window.orderBy(col("c_mktsegment"))).cast("bigint").as("segment_id"),
        col("c_mktsegment"))
      .orderBy(col("segment_id"))

  // q11 — star-schema fact build (the reference's silver→gold core: J1
  // expression join + J2 USING join + column pruning, silver_to_gold.py:63-79)
  // transposed onto the testdata star. Both dims broadcast.
  def q11StarFact(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    val dimDate = q09DateDim(s, dir).select(col("date_id"), col("date_day"))
    val dimSeg = q10SurrogateDim(s, dir)
    o.withColumn("date_day", to_date(col("o_orderdate")))
      .join(broadcast(dimDate), Seq("date_day"), "left")
      .join(c, o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(dimSeg), Seq("c_mktsegment"), "left")
      .select(col("o_orderkey").as("order_event_id"), col("date_id"),
        col("segment_id"), col("o_totalprice"))
      .orderBy(col("order_event_id"))
  }

  // q12 — rollup with grouping id (engine agg surface beyond reference).
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus"))

  // q13 — set operations: INTERSECT / EXCEPT / UNION ALL, tagged.
  def q13SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val y95 = o.filter(year(col("o_orderdate")) === lit(1995)).select(col("o_custkey"))
    val y96 = o.filter(year(col("o_orderdate")) === lit(1996)).select(col("o_custkey"))
    val both = y95.intersect(y96).withColumn("tag", lit("both"))
    val only95 = y95.except(y96).withColumn("tag", lit("only95"))
    both.unionByName(only95)
      .select(col("tag"), col("o_custkey"))
      .orderBy(col("tag"), col("o_custkey"))
  }

  // q14 — JSON extraction from a string column (engine analog of the
  // reference's reader-level JSON handling, SURVEY §2.6 note: from_json /
  // get_json_object over an ingested string column).
  def q14JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("bigint").as("sum_k"))
      .orderBy(col("event_type"))

  // q15 — tumbling-window aggregation over the events table: the batch
  // equivalent of the Structured Streaming path (SURVEY §2.7); window() start
  // aligns to the epoch, matching DuckDB time_bucket.
  def q15EventWindows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("bucket"), col("event_type"))

  // q16 — scalar-function surface (SURVEY §2.6): string ops, conditional,
  // math; all codegen'd builtins, no UDFs.
  def q16Scalars(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("seg_key"),
        when(col("c_acctbal") < lit(0.0), lit("negative"))
          .when(col("c_acctbal") < lit(5000.0), lit("mid"))
          .otherwise(lit("high")).as("bal_band"),
        abs(col("c_acctbal")).as("abs_bal"),
        floor(col("c_acctbal")).cast("bigint").as("floor_bal"))
      .orderBy(col("c_custkey"))

  // q17 — correlated-style aggregate filter (HAVING): orders whose line count
  // and revenue exceed thresholds. One shuffle (groupBy o_orderkey).
  def q17HavingAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice")).as("gross"))
      .filter(col("n_lines") >= lit(6))
      .orderBy(col("l_orderkey"))

  // q51 — ntile bucketing: quartiles of customers by balance per segment.
  def q51Ntile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  // q52 — sliding-frame moving average (3 preceding .. current) per supplier.
  def q52MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(-3, Window.currentRow)
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        (sum(col("l_quantity").cast("decimal(30,6)")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("qty_ma4"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  // q53 — lag/lead deltas: order-to-order totalprice change per customer.
  def q53LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // q54 — ordered string aggregation (listagg within group).
  def q54ListAgg(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .groupBy(col("n_regionkey"))
      // collect_list order is partition-dependent; sort before joining so
      // the aggregation is deterministic (== string_agg ... ORDER BY)
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy(col("n_regionkey"))

  // q28 — exact distinct aggregation (expand + two-phase agg under the hood;
  // approx_count_distinct (HLL++) is the sketch alternative, not oracle-able).
  def q28DistinctStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  // q35 — 5-way star join (TPC-H Q5 shape): region → nation → customer →
  // orders → lineitem. Catalyst reorders; region/nation/customer broadcast;
  // the single shuffle pair is orders⋈lineitem on the order key.
  def q35RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Engine-side catalog surface (C1-C4, gold_catalog.py:52-84): register the
    * testdata as views and answer ad-hoc SQL — the reference's demo query
    * transposed. Verified rows-only (DuckDB SHOW/DESCRIBE differ in shape). */
  def q18CatalogSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey LIMIT 5""".stripMargin)
  }

  // q36 — correlated scalar subquery (Catalyst decorrelates into an agg+join;
  // SURVEY §4.2 "subquery decorrelation available but unexercised").
  def q36ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 2.0 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) /
        |         CAST(COUNT(*) AS DOUBLE)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  // q37 — IN + NOT EXISTS subqueries (semi/anti via the SQL surface).
  def q37InExists(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  // q38 — pivot: order counts per priority spread across status columns
  // (expressed as conditional aggregation — identical semantics in any SQL).
  def q38Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))

  // q39 — exact percentiles (sort-based; both engines interpolate
  // (a+b)/2-style on the same doubles → deterministic). The two
  // l_extendedprice percentiles share ONE aggregate via the array form —
  // one value buffer per group instead of two.
  def q39Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, array(0.25D, 0.95D))").as("pp"))
      .select(col("l_returnflag"), col("median_qty"),
        col("pp").getItem(0).as("p25_price"), col("pp").getItem(1).as("p95_price"))
      .orderBy(col("l_returnflag"))

  // q71 — bi-national volume shipping (TPC-H Q7 shape): lineitem joined to
  // BOTH its supplier's and its customer's nation, restricted to one nation
  // pair in either direction. Scale shape: the two big-table joins
  // (lineitem⋈orders) shuffle on the order key once; supplier/customer/nation
  // are bounded dims → broadcast, so adding three more dims costs zero extra
  // exchanges. The nation-pair filter lands on the broadcast build sides.
  def q71VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(s, dir)
    val sup = Tables.supplier(s, dir)
    val c = Tables.customer(s, dir)
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), sup("s_nationkey") === n1("s_nkey"))
      .join(broadcast(n2), c("c_nationkey") === n2("c_nkey"))
      .filter((col("supp_nation") === lit("NATION_1") && col("cust_nation") === lit("NATION_2")) ||
              (col("supp_nation") === lit("NATION_2") && col("cust_nation") === lit("NATION_1")))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  // q79 — market share (TPC-H Q8 shape): a conditional-aggregate ratio —
  // one pass computes both the nation's revenue and total revenue per year;
  // the share divides the two exact decimal sums as doubles (deterministic,
  // no per-row double accumulation).
  def q79MarketShare(s: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(s, dir).filter(col("p_type") === lit("PROMO"))
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    l.join(promo, l("l_partkey") === promo("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(
        dsum(when(col("n_name") === lit("NATION_3"), rev).otherwise(lit(0.0))).as("nation_rev"),
        dsum(rev).as("total_rev"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy(col("o_year"))
  }

  // q83 — product-line profit (TPC-H Q9 shape, adapted: no partsupp table in
  // the testdata, so supply cost is modeled as 10% of p_retailprice). The
  // LIKE filter prunes part BEFORE the broadcast; profit is summed exactly.
  def q83ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val bolts = Tables.part(s, dir).filter(col("p_name").like("%bolt%"))
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.1) * col("p_retailprice") * col("l_quantity")
    l.join(bolts, l("l_partkey") === bolts("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(dsum(profit).as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  // q84 — customer order-count distribution (TPC-H Q13 shape): LEFT join with
  // an extra join-side predicate (priority filter belongs in the ON clause,
  // not WHERE — WHERE would turn the outer join inner), then a two-level
  // aggregation. Both aggs are simple hash-aggs; the second one is tiny.
  def q84OrderDist(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= lit("1-URGENT"))
    val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // q99 — co-purchase pair counting (the support-counting pass of frequent
  // itemset mining): distinct parts per order, self-joined within the order
  // to emit each unordered pair once, counted, top-50. Scale shape: the
  // pair blowup is quadratic in BASKET size (~6 items → ~15 pairs), linear
  // in order count — safe at any corpus scale; the self-join reuses the
  // (orderkey) shuffle of the distinct, and the count is partial+final on
  // the pair key. The classic retail-analytics first pass.
  def q99Copurchase(s: SparkSession, dir: String): DataFrame = {
    // baskets via collect_set (distinct-within-order for free, ONE shuffle
    // on the order key), then the pair expansion is two scan-local
    // generators — no self-join re-shuffle. Two exchanges total: baskets +
    // pair count.
    val baskets = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    baskets
      .select(explode(col("parts")).as("part_a"), col("parts"))
      .select(col("part_a"), explode(col("parts")).as("part_b"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(50)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project" -> q02FilterProject _,
    "q03_top_revenue" -> q03TopRevenue _,
    "q04_left_join" -> q04LeftJoin _,
    "q05_semi_join" -> q05SemiJoin _,
    "q06_anti_join" -> q06AntiJoin _,
    "q07_dedup_first" -> q07DedupFirst _,
    "q08_window_running" -> q08WindowRunning _,
    "q09_date_dim" -> q09DateDim _,
    "q10_surrogate_dim" -> q10SurrogateDim _,
    "q11_star_fact" -> q11StarFact _,
    "q12_rollup" -> q12Rollup _,
    "q13_set_ops" -> q13SetOps _,
    "q14_json_extract" -> q14JsonExtract _,
    "q15_event_windows" -> q15EventWindows _,
    "q16_scalars" -> q16Scalars _,
    "q17_having_agg" -> q17HavingAgg _,
    "q18_catalog_sql" -> q18CatalogSql _,
    "q28_distinct_stats" -> q28DistinctStats _,
    "q35_region_revenue" -> q35RegionRevenue _,
    "q36_scalar_subquery" -> q36ScalarSubquery _,
    "q37_in_exists" -> q37InExists _,
    "q38_pivot" -> q38Pivot _,
    "q39_percentiles" -> q39Percentiles _,
    "q71_volume_shipping" -> q71VolumeShipping _,
    "q79_market_share" -> q79MarketShare _,
    "q83_product_profit" -> q83ProductProfit _,
    "q84_order_dist" -> q84OrderDist _,
    "q99_copurchase" -> q99Copurchase _,
    "q51_ntile" -> q51Ntile _,
    "q52_moving_avg" -> q52MovingAvg _,
    "q53_lag_lead" -> q53LagLead _,
    "q54_listagg" -> q54ListAgg _
  )

  /** DuckDB-dialect oracle SQL, value- and name-aligned with the Spark side. */
  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_top_revenue" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q04_left_join" ->
      """SELECT o_orderkey, c_name, COALESCE(c_mktsegment, 'UNKNOWN') AS segment
        |FROM orders
        |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000.0) c
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q07_dedup_first" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM (
        |  SELECT l_orderkey, l_partkey, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
        |  FROM lineitem) t
        |WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q08_window_running" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_quantity, running_qty FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |    CAST(row_number() OVER w AS INT) AS rn,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) OVER (
        |      PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) t WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q09_date_dim" ->
      """SELECT CAST(strftime(date_day, '%Y%m%d') AS INT) AS date_id,
        |  CAST(date_day AS TIMESTAMP) AS date_day,
        |  CAST(year(date_day) AS INT) AS year,
        |  CAST(month(date_day) AS INT) AS month,
        |  CAST(day(date_day) AS INT) AS day,
        |  strftime(date_day, '%a') AS weekday
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_day FROM orders) d
        |ORDER BY date_id""".stripMargin,
    "q10_surrogate_dim" ->
      """SELECT CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS segment_id,
        |  c_mktsegment
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) t
        |ORDER BY segment_id""".stripMargin,
    "q11_star_fact" ->
      """WITH dim_date AS (
        |  SELECT CAST(strftime(date_day, '%Y%m%d') AS INT) AS date_id, date_day
        |  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_day FROM orders) d),
        |dim_seg AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS segment_id,
        |    c_mktsegment
        |  FROM (SELECT DISTINCT c_mktsegment FROM customer) t)
        |SELECT o_orderkey AS order_event_id, dd.date_id, ds.segment_id, o_totalprice
        |FROM orders o
        |LEFT JOIN dim_date dd ON CAST(o.o_orderdate AS DATE) = dd.date_day
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN dim_seg ds ON c.c_mktsegment = ds.c_mktsegment
        |ORDER BY order_event_id""".stripMargin,
    "q12_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |  l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,
    "q13_set_ops" ->
      """SELECT 'both' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) a
        |UNION ALL
        |SELECT 'only95' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) b
        |ORDER BY tag, o_custkey""".stripMargin,
    "q14_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q15_event_windows" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,
    "q16_scalars" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS seg_key,
        |  CASE WHEN c_acctbal < 0.0 THEN 'negative'
        |       WHEN c_acctbal < 5000.0 THEN 'mid'
        |       ELSE 'high' END AS bal_band,
        |  abs(c_acctbal) AS abs_bal,
        |  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q17_having_agg" ->
      """SELECT l_orderkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS gross
        |FROM lineitem
        |GROUP BY l_orderkey
        |HAVING COUNT(*) >= 6
        |ORDER BY l_orderkey""".stripMargin,
    "q18_catalog_sql" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey LIMIT 5""".stripMargin,
    "q28_distinct_stats" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q35_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q36_scalar_subquery" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 2.0 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) /
        |         CAST(COUNT(*) AS DOUBLE)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q37_in_exists" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q38_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q39_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  quantile_cont(l_extendedprice, 0.95) AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q71_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
        |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q79_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(CASE WHEN n_name = 'NATION_3'
        |    THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS nation_rev,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CAST(CASE WHEN n_name = 'NATION_3'
        |    THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type = 'PROMO'
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q83_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) - 0.1*p_retailprice*l_quantity
        |    AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q84_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q99_copurchase" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |  COUNT(*) AS n_orders
        |FROM op a JOIN op b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b
        |LIMIT 50""".stripMargin,
    "q51_ntile" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
        |FROM customer
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q52_moving_avg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) OVER w AS DOUBLE) /
        |  CAST(COUNT(*) OVER w AS DOUBLE) AS qty_ma4
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q53_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_totalprice - lag(o_totalprice, 1) OVER w AS delta_prev,
        |  lead(o_orderkey, 1) OVER w AS next_orderkey
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q54_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin
  )
}
