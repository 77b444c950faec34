package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Pin
import graft.core.{CacheScope, Tables}

/** Round-2 widening of the relational surface: the operator families a user
  * of a general lakehouse SQL engine reaches for next — full outer joins,
  * cube / grouping sets, unpivot, array higher-order functions, the string /
  * regex bouquet, per-group top-k, time-range window frames, conditional
  * aggregation, stratified sampling, and redaction. (The reference's own
  * surface is covered by Relational; SURVEY.md §2.3/§2.4 note these come
  * "free from Spark" — here they are exercised and oracle-verified.)
  *
  * Same discipline as Relational: decimal-cast double sums (order-independent
  * at any parallelism), deterministic total output order with explicit null
  * placement, broadcast-sized dims, filters/pruning at the scan.
  */
object Extended {

  private def dsum(c: Column): Column = sum(c.cast("decimal(30,6)")).cast("double")

  // q55 — FULL OUTER join: per-customer order rollup vs the rich-customer
  // dim; either side may be missing (customers without orders / order keys
  // outside the dim filter). Null-safe output via coalesced key.
  def q55FullOuter(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    val rich = Tables.customer(s, dir).filter(col("c_acctbal") > lit(7000.0))
    rich.join(agg, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"), col("total_price"))
      .orderBy(col("custkey"))
  }

  // q56 — CUBE over (returnflag, linestatus) with grouping indicators: all
  // four aggregation levels in ONE pass (Catalyst expands the grouping sets
  // into a single shuffle, not four scans).
  def q56Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  // q57 — unpivot/melt (wide metrics -> long form), the standard shape for
  // per-metric profiling pipelines. Native Dataset.unpivot: one generate,
  // no self-union of scans.
  def q57Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).filter(col("l_orderkey") <= 1000)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  // q58 — array higher-order functions over per-order price vectors:
  // collect → sort desc → top-3 sum / threshold count. top3 addition is
  // written as an explicit left-to-right 3-term sum (same fp rounding in
  // any engine); get() is 0-based and null on out-of-bounds (ANSI-safe).
  def q58HofArrays(s: SparkSession, dir: String): DataFrame = {
    def p(i: Int): Column = coalesce(get(col("prices"), lit(i)), lit(0.0))
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_extendedprice")), asc = false).as("prices"))
      .select(col("l_orderkey"),
        size(col("prices")).as("n_items"),
        (p(0) + p(1) + p(2)).as("top3_sum"),
        size(filter(col("prices"), x => x > lit(4000.0))).as("n_big"))
      .orderBy(col("l_orderkey"))
  }

  // q59 — scalar string/regex bouquet (SURVEY §2.6 notes the reference has
  // no string functions at all; the engine's users will).
  def q59Strings(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(col("p_partkey"),
      upper(substring(col("p_name"), 1, 12)).as("name_prefix"),
      length(col("p_name")).as("name_len"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
      translate(col("p_brand"), "#", "-").as("brand_norm"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      levenshtein(col("p_brand"), substring(col("p_type"), 1, 8)).cast("bigint").as("lev"))
      .orderBy(col("p_partkey"))

  // q60 — per-group top-k (top 3 suppliers by revenue within each nation):
  // agg once on the big side, then a bounded window — the rank never sees
  // unaggregated fact rows.
  def q60TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir).groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
    rev.join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("s_suppkey"), col("s_name"), col("revenue"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 3)
      .orderBy(col("s_nationkey"), col("rnk"))
  }

  // q61 — time-RANGE window frame: per customer, rolling 30-day order total.
  // RANGE (not ROWS): all orders within the interval regardless of count —
  // the frame Spark evaluates per partition after one shuffle on custkey.
  def q61RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
      .rangeBetween(-30L * 86400 * 1000000L, 0)
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
      sum(col("o_totalprice").cast("decimal(30,6)")).over(w).cast("double").as("rolling_30d"),
      count(lit(1)).over(w).as("n_30d"))
      .orderBy(col("o_orderkey"))
  }

  // q62 — conditional aggregation (filtered counts/sums in one pass — the
  // poor man's grouping sets for sparse predicates).
  def q62ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).groupBy(col("c_nationkey"))
      .agg(
        count(when(col("c_acctbal") < 0, 1)).as("n_negative"),
        dsum(when(col("c_mktsegment") === "BUILDING", col("c_acctbal")).otherwise(lit(0.0)))
          .as("building_bal"),
        max(length(col("c_name"))).as("max_name_len"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))

  // q63 — deterministic stratified sampling: per-language keep rates via the
  // cross-engine md5 hash of the key (TextFunctions.h60 % 100) — the
  // reproducible variant of sampleBy(), and the primitive for rebalancing
  // a training corpus's language mix. No shuffle: a scan-local filter.
  def q63StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.TextFunctions.h60(col("doc_id").cast("string")) % 100
    val rate = when(col("lang") === "en", lit(10))
      .when(col("lang") === "zh", lit(30)).otherwise(lit(60))
    Tables.documents(s, dir)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  // q64 — redaction: mask digit runs in the event payload (the PII-scrub
  // shape: regexp_replace at the scan, no shuffle).
  def q64Redact(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_id") < 5000)
      .select(col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "#").as("props_redacted"),
        length(col("props")).as("raw_len"))
      .orderBy(col("event_id"))

  // q65 — GROUPING SETS via the SQL surface (three explicit aggregation
  // levels over the supplier->nation->region snowflake, one shuffle).
  def q65GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(groupingSetsSql)
  }

  /** Runs verbatim on Spark AND DuckDB (the catalog-SQL posture of the
    * reference's gold layer, gold_catalog.py:80-84). */
  private val groupingSetsSql =
    """SELECT n_name, r_name,
      |  CAST(grouping(n_name) AS INT) AS g_n, CAST(grouping(r_name) AS INT) AS g_r,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal,
      |  count(*) AS n_suppliers
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((n_name, r_name), (r_name), ())
      |ORDER BY g_n, g_r, n_name NULLS FIRST, r_name NULLS FIRST""".stripMargin

  // q66 — bloom-filter join pruning: build a bloom over the (filtered)
  // orders keys, broadcast it, and prune the lineitem SCAN before the join
  // shuffle (BloomFunctions — the 100 TB pre-shuffle reducer). Bloom false
  // positives are removed by the exact join, so the result is identical to
  // the unpruned join — the oracle runs the plain join and must agree.
  def q66BloomPrune(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomFunctions
    BloomFunctions.register(s)
    // three consumers: bloom sizing count, bloom agg, join build side
    val hot = CacheScope.cached(Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp")))
    // materialize the bloom on the driver (one tiny job over the dim) and
    // inject it as a binary literal — the same evaluate-subquery-then-inject
    // step Catalyst's runtime filters perform; might_contain requires a
    // constant/scalar-subquery bloom.
    val bf = bloom_materialize(hot)
    val pruned = Tables.lineitem(s, dir)
      .filter(BloomFunctions.mightContain(lit(bf), col("l_orderkey")))
    pruned.join(hot.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  // q67 — BM25 relevance scoring (Robertson/Spärck Jones; k1=1.2, b=0.75)
  // for a fixed query-term set, per (doc, term) — the retrieval-quality
  // primitive of a training-data search index. Corpus stats (N, avg dl, df)
  // are one agg each over the token explode; all per-row arithmetic is a
  // deterministic double chain (no cross-row float summation), and the
  // oracle recomputes it exactly (ln agrees within the 1e-9 compare).
  def q67Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "table")
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    val dlen = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dlen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avg_dl"))
    val tf = tok.filter(col("t").isin(terms: _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("t")).agg(count(lit(1)).as("df_t"))
    val k1 = lit(1.2)
    val b = lit(0.75)
    tf.join(dlen, "doc_id").join(broadcast(dft), "t").crossJoin(broadcast(stats))
      .withColumn("idf", Pin.grid9(
        log((col("n_docs").cast("double") - col("df_t") + 0.5) / (col("df_t") + 0.5) + 1.0)))
      .withColumn("score",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + k1 * (lit(1.0) - b + b * col("dl").cast("double") / col("avg_dl"))))
      .select(col("doc_id"), col("t").as("term"), col("tf"), col("score"))
      .orderBy(col("doc_id"), col("term"))
  }

  // q68 — int8 embedding quantization (max-abs scaling), the standard
  // vector-compression step before indexing at corpus scale: 4x smaller
  // than float32, error bounded by scale/2. Scan-local (no shuffle).
  // The quantized vector is emitted comma-joined (a string cell, still
  // element-exact) because the verify harness hashes pandas frames, which
  // cannot sort/factorize array-typed cells.
  def q68EmbedQuant(s: SparkSession, dir: String): DataFrame = {
    val maxAbs = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    Tables.embeddings(s, dir)
      .withColumn("max_abs", maxAbs)
      .withColumn("scale",
        when(col("max_abs") === 0.0, lit(0.0)).otherwise(lit(127.0) / col("max_abs")))
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("embedding"),
          x => round(x.cast("double") * col("scale")).cast("int").cast("string")), ",")
          .as("qvec"))
      .orderBy(col("vec_id"))
  }

  /** One aggregate job over the (small) key side → the bloom bytes.
    * Sized from the actual build-side key count (count + agg = two tiny
    * jobs over the filtered dim) at ~8 bits/key (~2% fp with optimal k) —
    * a fixed size would silently saturate into a pass-through at larger
    * scale factors and lose the pre-shuffle pruning this operator exists
    * for. Correctness never depends on the sizing (exact join follows). */
  private def bloom_materialize(keyed: DataFrame): Array[Byte] = {
    import graft.functions.BloomFunctions
    val items = math.max(keyed.count(), 1L)
    keyed.agg(BloomFunctions.bloomAgg(col("o_orderkey"), items, items * 8L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  // --------------------------------------------------------------------- //

  /** q153 — 2-D skyline (Pareto frontier; Börzsönyi et al., ICDE 2001 —
    * public) over parts minimizing (p_retailprice, p_size): a part
    * survives iff no other part is ≤ on both dims and < on at least one
    * (equal (price, size) twins are mutually non-dominating and both
    * survive). The multi-objective shortlist primitive ("cheapest AND
    * smallest" candidate sets).
    *
    * NOT the quadratic exists-a-dominator formulation (which the oracle
    * deliberately runs): dominance against CHEAPER parts collapses to one
    * running minimum over the price-sorted axis —
    *   dominated ⟺ min size among strictly-cheaper parts ≤ my size,
    *            OR min size among equal-price parts < my size.
    * Both minima come from the per-distinct-price frame (price-cardinality
    * bounded, not row-bounded): a corpus-sized aggregate on the price key,
    * one tiny single-partition lag window over distinct prices, and a
    * broadcast join back. All comparisons are integer/decimal — no float
    * boundary rides the selection.
    *
    * Scale shape: one partial+final min-aggregate on price + one broadcast
    * join — no self-join, no |rows|² anywhere; the window runs on
    * |distinct prices| rows. */
  def q153Skyline(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
    val perPrice = parts.groupBy(col("p_retailprice").as("pr"))
      .agg(min(col("p_size")).as("min_eq"))
    val w = Window.orderBy(col("pr")) // |distinct prices| rows — tiny
    val mins = perPrice
      .withColumn("min_lt", min(col("min_eq"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("pr"), col("min_eq"), col("min_lt"))
    parts.join(broadcast(mins), col("p_retailprice") === col("pr"))
      .filter((col("min_lt").isNull || col("min_lt") > col("p_size")) &&
        col("min_eq") >= col("p_size"))
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_retailprice"), col("p_size"), col("p_partkey"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_skyline" -> (q153Skyline _),
    "q66_bloom_prune" -> (q66BloomPrune _),
    "q67_bm25" -> (q67Bm25 _),
    "q68_embed_quant" -> (q68EmbedQuant _),
    "q55_full_outer" -> (q55FullOuter _),
    "q56_cube" -> (q56Cube _),
    "q57_unpivot" -> (q57Unpivot _),
    "q58_hof_arrays" -> (q58HofArrays _),
    "q59_strings" -> (q59Strings _),
    "q60_topk_group" -> (q60TopKPerGroup _),
    "q61_range_frame" -> (q61RangeFrame _),
    "q62_conditional_agg" -> (q62ConditionalAgg _),
    "q63_stratified_sample" -> (q63StratifiedSample _),
    "q64_redact" -> (q64Redact _),
    "q65_grouping_sets" -> (q65GroupingSets _)
  )

  def oracles: Map[String, String] = Map(
    // deliberately the quadratic exists-a-dominator formulation — a
    // completely different algorithm cross-checking the running-min plan
    "q153_skyline" ->
      """SELECT p.p_partkey, p.p_name, p.p_size, p.p_retailprice
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
        |ORDER BY p.p_retailprice, p.p_size, p.p_partkey""".stripMargin,
    "q67_bm25" ->
      """WITH tok AS (
        |  SELECT d.doc_id, t.t
        |  FROM documents d, unnest(regexp_split_to_array(trim(d.text), '\s+')) AS t(t)),
        |dlen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |stats AS (
        |  SELECT count(*) AS n_docs,
        |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_dl
        |  FROM dlen),
        |tf AS (
        |  SELECT doc_id, t, count(*) AS tf FROM tok
        |  WHERE t IN ('spark', 'table') GROUP BY doc_id, t),
        |dft AS (SELECT t, count(*) AS df_t FROM tf GROUP BY t)
        |SELECT tf.doc_id, tf.t AS term, tf.tf,
        |  (floor(ln((CAST(n_docs AS DOUBLE) - df_t + 0.5) / (df_t + 0.5) + 1.0)
        |    * 1.0e9 + 0.5) / 1.0e9) *
        |    (tf.tf * (CAST(1.2 AS DOUBLE) + 1.0)) /
        |    (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avg_dl)) AS score
        |FROM tf JOIN dlen USING (doc_id) JOIN dft USING (t) CROSS JOIN stats
        |ORDER BY doc_id, term""".stripMargin,
    "q68_embed_quant" ->
      """WITH m AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS max_abs
        |  FROM embeddings)
        |SELECT vec_id,
        |  CASE WHEN max_abs = 0 THEN 0.0 ELSE 127.0 / max_abs END AS scale,
        |  array_to_string(list_transform(e, x -> CAST(round(x * (CASE WHEN max_abs = 0 THEN 0.0 ELSE 127.0 / max_abs END)) AS INT)), ',') AS qvec
        |FROM m ORDER BY vec_id""".stripMargin,
    "q66_bloom_prune" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q55_full_outer" ->
      """WITH agg AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
        |  FROM orders GROUP BY o_custkey),
        |rich AS (SELECT * FROM customer WHERE c_acctbal > 7000)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders, total_price
        |FROM rich FULL OUTER JOIN agg ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q56_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q57_unpivot" ->
      """WITH src AS (SELECT * FROM lineitem WHERE l_orderkey <= 1000),
        |u AS (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src)
        |SELECT l_orderkey, l_linenumber, metric, value FROM u
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q58_hof_arrays" ->
      """WITH a AS (
        |  SELECT l_orderkey, list_reverse_sort(list(l_extendedprice)) AS prices
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(len(prices) AS INT) AS n_items,
        |  ((coalesce(prices[1], 0) + coalesce(prices[2], 0)) + coalesce(prices[3], 0)) AS top3_sum,
        |  CAST(len(list_filter(prices, x -> x > 4000)) AS INT) AS n_big
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "q59_strings" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 12)) AS name_prefix,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  translate(p_brand, '#', '-') AS brand_norm,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CAST(levenshtein(p_brand, substr(p_type, 1, 8)) AS BIGINT) AS lev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q60_topk_group" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY l_suppkey),
        |r AS (
        |  SELECT s_nationkey, s_suppkey, s_name, revenue,
        |    CAST(row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY revenue DESC, s_suppkey) AS INT) AS rnk
        |  FROM rev JOIN supplier ON l_suppkey = s_suppkey)
        |SELECT s_nationkey, s_suppkey, s_name, revenue, rnk FROM r
        |WHERE rnk <= 3 ORDER BY s_nationkey, rnk""".stripMargin,
    "q61_range_frame" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE) AS rolling_30d,
        |  count(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q62_conditional_agg" ->
      """SELECT c_nationkey,
        |  count(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative,
        |  CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal ELSE 0.0 END
        |    AS DECIMAL(30,6))) AS DOUBLE) AS building_bal,
        |  CAST(max(length(c_name)) AS INT) AS max_name_len,
        |  count(*) AS n_customers
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q63_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, source, bucket FROM b
        |WHERE bucket < (CASE WHEN lang = 'en' THEN 10 WHEN lang = 'zh' THEN 30 ELSE 60 END)
        |ORDER BY doc_id""".stripMargin,
    "q64_redact" ->
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
        |  CAST(length(props) AS INT) AS raw_len
        |FROM events WHERE event_id < 5000
        |ORDER BY event_id""".stripMargin,
    "q65_grouping_sets" -> groupingSetsSql
  )
}
