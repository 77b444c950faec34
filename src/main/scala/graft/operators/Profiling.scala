package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Pin
import graft.core.Tables
import graft.functions.{TextFunctions, VectorFunctions}

/** Corpus-profiling operators: the release-report family a training-data
  * pipeline runs to characterize a corpus build — inter-source divergence,
  * privacy (k-anonymity), leakage-safe splitting, Heaps'-law growth,
  * temperature-scaled mixtures, tokenizer fertility, and robust outlier
  * detection. Every query is DuckDB-oracle-exact (integer or pinned
  * fixed-point arithmetic; single terminal IEEE chains).
  */
object Profiling {

  // ------------------------------------------- q172 Jensen–Shannon matrix

  /** q172 — pairwise Jensen–Shannon divergence between source unigram
    * distributions: the standard symmetric, bounded ([0, ln 2]) "how
    * different are these two sources" number that mixture design reads
    * (cf. q158's asymmetric source-vs-corpus KL).
    *
    * Decomposition that avoids a full outer join: for words present in
    * only one of the pair, p/m = 2 exactly, so their total contribution
    * is ln2·((1−Sa) + (1−Sb))/2 where Sa/Sb are the SHARED probability
    * masses — integer count sums divided once. The shared-word terms are
    * difference-paired lns (ln(2·ca·tb) − ln(ca·tb + cb·ta)), so equal
    * proportions contribute exactly 0, summed order-free as
    * floor(term·1e15) decimal(38,0) (q158 convention). Count·total
    * products stay ≲1e13 ≪ 2^53 at sf1, so the double products are exact.
    *
    * Scale shape: one (source, word) partial+final count, one self-join
    * keyed on word (fan-out per word ≤ C(|sources|,2) — source count is
    * small and fixed), one pair-keyed aggregate of |pairs| rows. Nothing
    * corpus-quadratic; vocab-bounded after the map-side combine. */
  def jsDivergence(docs: DataFrame): DataFrame = {
    val u = docs
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
    val t = u.groupBy(col("source")).agg(sum(col("c")).as("tot"))
    val ut = u.join(broadcast(t), Seq("source"))
    val a = ut.select(col("source").as("src_a"), col("word"),
      col("c").as("ia"), col("tot").as("ita"))
    val b = ut.select(col("source").as("src_b"), col("word"),
      col("c").as("ib"), col("tot").as("itb"))
    val ca = col("ia").cast("double"); val cb = col("ib").cast("double")
    val ta = col("ita").cast("double"); val tb = col("itb").cast("double")
    val cross = ca * tb + cb * ta
    val term = (ca / ta / lit(2.0)) *
      (Pin.grid9(log(lit(2.0) * ca * tb)) - Pin.grid9(log(cross))) +
      (cb / tb / lit(2.0)) *
      (Pin.grid9(log(lit(2.0) * cb * ta)) - Pin.grid9(log(cross)))
    a.join(b, Seq("word")).filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("ita"), col("itb"))
      .agg(count(lit(1)).as("shared_words"),
        sum(col("ia")).as("sa"), sum(col("ib")).as("sb"),
        sum(floor(term * lit(1e15)).cast("decimal(38,0)")).as("fsum"))
      .select(col("src_a"), col("src_b"), col("shared_words"),
        (lit(math.log(2.0)) * ((lit(1.0) - col("sa").cast("double") / col("ita").cast("double")) +
          (lit(1.0) - col("sb").cast("double") / col("itb").cast("double"))) / lit(2.0) +
          col("fsum").cast("double") / lit(1e15)).as("jsd"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // ---------------------------------------------------- q173 k-anonymity

  /** The k thresholds every privacy report quotes. */
  private[graft] val KThresholds = Seq(2, 5, 10, 20, 50)

  /** q173 — k-anonymity profile over the customer quasi-identifier pair
    * (nationkey, mktsegment): for each k, how many equivalence classes
    * and rows fall below it. The re-identification risk gate run before
    * any record-level data release.
    *
    * Scale shape: ONE groupBy over the QI columns (class count bounded by
    * the QI domain product, not the row count), then a cross join against
    * a 5-row literal k frame — broadcast, cost |classes|·|ks|. All counts
    * integer; the at-risk fraction is one terminal double division. */
  def kAnonymity(spark: SparkSession, customer: DataFrame): DataFrame = {
    val cls = customer.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("sz"))
    val ks = spark.createDataFrame(KThresholds.map(Tuple1(_)))
      .toDF("k").select(col("k").cast("int").as("k"))
    cls.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_rows"),
        min(col("sz")).as("min_class"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L)).as("classes_below"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L)).as("rows_below"))
      .select(col("k"), col("n_classes"), col("n_rows"), col("min_class"),
        col("classes_below"), col("rows_below"),
        (col("rows_below").cast("double") / col("n_rows").cast("double"))
          .as("at_risk_frac"))
      .orderBy(col("k"))
  }

  // ---------------------------------------------------- q265 l-diversity

  /** The ℓ thresholds (sensitive-value diversity floors) the release
    * gate quotes — the sensitive domain here has 6 buckets, so 2/3/5
    * span trivial to near-full diversity. */
  private[graft] val LThresholds = Seq(2, 3, 5)

  /** q265 — ℓ-diversity profile (Machanavajjhala et al., ICDE 2006):
    * k-anonymity's q173 gate counts CLASS SIZES, but a class of 50
    * customers all sharing one sensitive value still leaks it to a
    * linking attacker — distinct ℓ-diversity requires every
    * quasi-identifier class to contain at least ℓ distinct sensitive
    * values. Same QI pair as q173 (nationkey, mktsegment); the
    * sensitive attribute is the account-balance band
    * floor(c_acctbal / 2000) — a 6-bucket domain whose per-class
    * distinct count is the ℓ of that class. Per threshold: classes and
    * rows below, the corpus minimum ℓ, and the at-risk fraction.
    *
    * Exactness: the band is floor of one correctly-rounded division —
    * identical cross-engine; everything after is integer counting with
    * one terminal double division. Scale shape: one QI groupBy with a
    * distinct-count (class count bounded by the QI domain), a 3-row
    * broadcast threshold attach — q173's cost with one extra distinct
    * aggregation inside the same shuffle. */
  def lDiversity(spark: SparkSession, customer: DataFrame): DataFrame = {
    val cls = customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(2000.0)).cast("long").as("sv"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("sz"), count_distinct(col("sv")).as("l"))
    val ls = spark.createDataFrame(LThresholds.map(Tuple1(_)))
      .toDF("l_min").select(col("l_min").cast("int").as("l_min"))
    cls.crossJoin(broadcast(ls))
      .groupBy(col("l_min"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_rows"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < col("l_min"), 1L).otherwise(0L)).as("classes_below"),
        sum(when(col("l") < col("l_min"), col("sz")).otherwise(0L)).as("rows_below"))
      .select(col("l_min"), col("n_classes"), col("n_rows"), col("min_l"),
        col("classes_below"), col("rows_below"),
        (col("rows_below").cast("double") / col("n_rows").cast("double"))
          .as("at_risk_frac"))
      .orderBy(col("l_min"))
  }

  // ------------------------------------------------- q281 t-closeness

  /** q281's distance ceilings (0.2/0.35/0.5 span strict→lenient). */
  private[graft] val TThresholds = Seq(0.2, 0.35, 0.5)

  /** q281 — t-closeness profile (Li, Li & Venkatasubramanian, ICDE
    * 2007), completing the release-gate trio: q173 bounds class SIZE,
    * q265 bounds sensitive-value COUNT, but a class can satisfy both
    * while its sensitive DISTRIBUTION differs wildly from the corpus
    * (a skewed class still leaks — the attacker learns the class is
    * rich). t-closeness bounds, per quasi-identifier class, the Earth
    * Mover's Distance between the class's sensitive distribution and
    * the GLOBAL one over the ordered band domain: EMD_ordered =
    * Σ_i |P_cum(i) − Q_cum(i)| / (m−1).
    *
    * Exactness: the cumulative-probability differences are rationals
    * with common denominator sz·N — kept as INTEGER numerators
    * (|cumcnt·N − cumg·sz|, magnitude ≤ N², far under 2^63 at any
    * plausible sf) and summed exactly; t is ONE terminal double
    * division per class. Same QI pair and acctbal-band sensitive
    * attribute as q173/q265.
    *
    * Scale shape: two QI-keyed aggregates; the dense class×band grid is
    * a broadcast attach bounded by |QI domain| × |band domain| (never
    * row count); one windowed prefix sum over that bounded grid; a
    * 3-row threshold attach. */
  def tCloseness(spark: SparkSession, customer: DataFrame): DataFrame = {
    val sv = customer.select(col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / lit(2000.0)).cast("long").as("sv"))
    val classes = sv.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("sz"))
    val global = sv.groupBy(col("sv")).agg(count(lit(1)).as("g"))
    val tot = global.agg(sum(col("g")).as("nt"), count(lit(1)).as("m"))
    val cells = sv.groupBy(col("c_nationkey"), col("c_mktsegment"), col("sv"))
      .agg(count(lit(1)).as("cnt"))
    val grid = classes.crossJoin(broadcast(global))
      .join(cells, Seq("c_nationkey", "c_mktsegment", "sv"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("sv"))
    val perClass = grid.crossJoin(broadcast(tot))
      .withColumn("cumc", sum(col("cnt")).over(w))
      .withColumn("cumg", sum(col("g")).over(w))
      .withColumn("dterm", abs(col("cumc") * col("nt") - col("cumg") * col("sz")))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(max(col("sz")).as("sz"), sum(col("dterm")).as("dnum"),
        max(col("nt")).as("nt"), max(col("m")).as("m"))
      .withColumn("t_dist", col("dnum").cast("double") /
        (col("sz") * col("nt") * (col("m") - 1L)).cast("double"))
    val ts = spark.createDataFrame(TThresholds.map(Tuple1(_))).toDF("t_max")
    perClass.crossJoin(broadcast(ts))
      .groupBy(col("t_max"))
      .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows"),
        max(col("t_dist")).as("max_t"),
        sum(when(col("t_dist") > col("t_max"), 1L).otherwise(0L)).as("classes_above"),
        sum(when(col("t_dist") > col("t_max"), col("sz")).otherwise(0L)).as("rows_above"))
      .withColumn("at_risk_frac",
        col("rows_above").cast("double") / col("n_rows").cast("double"))
      .select(col("t_max"), col("n_classes"), col("n_rows"), col("max_t"),
        col("classes_above"), col("rows_above"), col("at_risk_frac"))
      .orderBy(col("t_max"))
  }

  // -------------------------------------------------------- q271 ICC

  /** q271's fixed-point scale for the order-free Σ (Sx_g²/n_g) sum. */
  private val IccScale = 1e6

  /** q271 — intraclass correlation of document length within sources
    * (one-way random-effects ICC(1), unbalanced ANOVA form with the
    * k₀ group-size correction; Fisher 1925): HOW SOURCE-CLUSTERED is a
    * per-doc metric — ICC ≈ 0 means sources are interchangeable for
    * this metric (stratifying on source buys nothing); ICC near 1
    * means the metric is really a SOURCE property and any per-doc
    * screen on it silently filters whole sources. The variance-
    * decomposition counterpart of q194's per-source mean test.
    *
    * Exactness: all base moments are exact integers; the one
    * order-sensitive piece — Σ_g Sx_g²/n_g over the source frame —
    * rides the q158 fixed-point floor(·1e6) decimal sum (each term is
    * an identical IEEE chain, the truncation identical cross-engine);
    * everything after is a mirrored double dag. Magnitude bound: the
    * scaled term must stay under 2^63, i.e. per-source char sums up to
    * ~3e6·√n_g — tens of GB of text per source; past that drop
    * IccScale to 1 (at those magnitudes the term is integral long
    * before the grid matters). Scale shape: one source-keyed moment
    * aggregate (bounded by |sources|), a 1-row fold. */
  def iccBySource(docs: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val g = docs.select(col("source"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("ng"),
        sum(dec(col("n_chars"))).cast("decimal(38,0)").as("sxg"),
        sum(dec(col("n_chars")) * dec(col("n_chars")))
          .cast("decimal(38,0)").as("sxxg"))
    val folded = g.agg(
      count(lit(1)).as("n_sources"),
      sum(col("ng")).as("n_docs"),
      sum(col("sxg")).cast("decimal(38,0)").as("sx"),
      sum(col("sxxg")).cast("decimal(38,0)").as("sxx"),
      sum(dec(col("ng")) * dec(col("ng"))).cast("decimal(38,0)").as("sng2"),
      sum(floor(d(col("sxg")) * d(col("sxg")) / d(col("ng")) * lit(IccScale))
        .cast("decimal(38,0)")).cast("decimal(38,0)").as("tdec"))
    val nn = d(col("n_docs")); val gg = d(col("n_sources"))
    val t = d(col("tdec")) / lit(IccScale)
    val ssb = t - d(col("sx")) * d(col("sx")) / nn
    val ssw = d(col("sxx")) - t
    val msb = ssb / (gg - lit(1.0))
    val msw = ssw / (nn - gg)
    val k0 = (nn - d(col("sng2")) / nn) / (gg - lit(1.0))
    folded.select(col("n_docs"), col("n_sources"),
      msb.as("ms_between"), msw.as("ms_within"), k0.as("k0"),
      ((msb - msw) / (msb + (k0 - lit(1.0)) * msw)).as("icc"))
  }

  // ------------------------------------------------ q174 split leakage

  /** q174 — leakage-safe train/validation split audit: split the corpus
    * 50/50 by md5 coin (first hex digit < '8') under two policies —
    * per-document hash vs per-content-cluster hash — and count the
    * exact-duplicate pairs that cross the split under each. The
    * doc-hash policy leaks every duplicated cluster (nt·nv pairs per
    * cluster); the cluster-hash policy leaks exactly 0 by construction,
    * and this query PROVES it from the data rather than asserting it.
    *
    * Scale shape: one md5-content groupBy (the q20 dedup key), two
    * constant-width aggregates over |clusters| rows. Integer pair
    * arithmetic; deterministic md5 coins (q89 convention). */
  def splitLeakage(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), md5(col("text")).as("ck"))
    val byCluster = d.groupBy(col("ck"))
      .agg(count(lit(1)).as("m"),
        sum(when(substring(md5(col("doc_id").cast("string")), 1, 1) < "8", 1L)
          .otherwise(0L)).as("nt"))
    val docPolicy = byCluster
      .agg(sum(col("nt")).as("train_docs"),
        sum(col("m") - col("nt")).as("val_docs"),
        sum(col("nt") * (col("m") - col("nt"))).as("leaked_pairs"))
      .select(lit("doc_hash").as("policy"), col("train_docs"), col("val_docs"),
        col("leaked_pairs"))
    val clusterPolicy = byCluster
      .withColumn("ct", when(substring(md5(col("ck")), 1, 1) < "8", col("m"))
        .otherwise(lit(0L)))
      .agg(sum(col("ct")).as("train_docs"),
        sum(col("m") - col("ct")).as("val_docs"),
        sum(col("ct") * (col("m") - col("ct"))).as("leaked_pairs"))
      .select(lit("cluster_hash").as("policy"), col("train_docs"),
        col("val_docs"), col("leaked_pairs"))
    docPolicy.unionAll(clusterPolicy).orderBy(col("policy"))
  }

  // ------------------------------------------------- q175 Heaps'-law fit

  /** q175 — Heaps'-law fit per source: regress ln(cumulative vocabulary)
    * on ln(cumulative tokens) over the doc_id-ordered stream, yielding
    * the growth exponent β and coefficient k (V ≈ k·T^β) — the
    * diminishing-returns curve that says how much NEW vocabulary another
    * 10× of this source buys (the model-fit twin of q107's raw growth
    * curve and q159's coverage curve).
    *
    * Cumulative vocabulary without re-scanning prefixes: each word
    * contributes at its FIRST doc (min doc_id per (source, word)), so
    * cumulative-distinct collapses to a windowed running sum of
    * first-occurrence counts. OLS moments are floor(ln-term·1e15)
    * decimal(38,0) sums (q162 convention); slope/intercept/k are one
    * terminal IEEE chain.
    *
    * Scale shape: one (source, word) min-aggregate, one (source, doc)
    * count, one per-source window sort (docs-per-source rows, the
    * unavoidable cost of an ordered curve), one source-keyed moment
    * aggregate. Nothing quadratic. */
  def heapsFit(docs: DataFrame): DataFrame = {
    val w = docs.select(col("source"), col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("word"))
    val tokd = w.groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("ntok"))
    val newd = w.groupBy(col("source"), col("word"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("source"), col("doc_id")).agg(count(lit(1)).as("nw"))
    val win = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val cum = tokd.join(newd, Seq("source", "doc_id"), "left")
      .select(col("source"), col("doc_id"), col("ntok"),
        coalesce(col("nw"), lit(0L)).as("nw"))
      .select(col("source"),
        sum(col("ntok")).over(win).as("ct"),
        sum(col("nw")).over(win).as("cv"))
    val x = Pin.grid9(log(col("ct").cast("double")))
    val y = Pin.grid9(log(col("cv").cast("double")))
    val m = cum.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(floor(x * lit(1e15)).cast("decimal(38,0)")).as("sx"),
        sum(floor(y * lit(1e15)).cast("decimal(38,0)")).as("sy"),
        sum(floor(x * y * lit(1e15)).cast("decimal(38,0)")).as("sxy"),
        sum(floor(x * x * lit(1e15)).cast("decimal(38,0)")).as("sxx"))
    val n = col("n_docs").cast("double")
    val dsx = col("sx").cast("double") / lit(1e15)
    val dsy = col("sy").cast("double") / lit(1e15)
    val dsxy = col("sxy").cast("double") / lit(1e15)
    val dsxx = col("sxx").cast("double") / lit(1e15)
    val det = n * dsxx - dsx * dsx
    val slope = (n * dsxy - dsx * dsy) / det
    val intercept = (dsy - slope * dsx) / n
    m.select(col("source"), col("n_docs"),
        when(det === lit(0.0), lit(null)).otherwise(slope).as("beta"),
        when(det === lit(0.0), lit(null)).otherwise(Pin.grid9(exp(intercept)))
          .as("k"))
      .orderBy(col("source"))
  }

  // --------------------------------------- q176 temperature-scaled mixture

  /** q176's pinned sampling budget (tokens) and temperature. */
  private[graft] val TempBudget = 100000L

  /** q176 — temperature-scaled source mixture (α = 0.5, the mC4/XLM-R
    * up-sampling convention): allocate a token budget across sources
    * proportional to n_tokens^α, flattening the natural distribution so
    * small sources aren't drowned. Completes the mixture-design family:
    * q161 apportions proportionally (α = 1), q167 water-fills (α → 0 with
    * caps), q106 SAMPLES docs by sqrt-doc-count with lossy floor-≥1
    * quotas; this is the exact-sum allocation REPORT over token mass —
    * quotas provably total the budget, natural vs flattened shares side
    * by side.
    *
    * Determinism: the only irrational step, sqrt(n)·1e6, is floored into
    * integer micro-weights ONCE per source; Hamilton largest-remainder
    * then runs in pure integer div/mod (q161 convention: quotas sum
    * EXACTLY to the budget at any parallelism, remainder ties broken by
    * source). Shares are single terminal divisions.
    *
    * Scale shape: one source aggregate, then |sources|-row arithmetic
    * with two scalar cross joins — constant work after the scan. */
  def tempMixture(docs: DataFrame): DataFrame = {
    val cells = docs
      .select(col("source"), size(TextFunctions.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast("double")) * lit(1e6)).cast("long"))
    val tot = cells.agg(sum(col("n_tokens")).as("tn"), sum(col("w")).as("tw"))
    val based = cells.crossJoin(broadcast(tot))
      .withColumn("base_quota", expr(s"($TempBudget * w) DIV tw"))
      .withColumn("rem", expr(s"($TempBudget * w) % tw"))
    val leftover = based.agg((lit(TempBudget) - sum(col("base_quota"))).as("l"))
    based
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      .crossJoin(broadcast(leftover))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tn").cast("double")).as("natural_share"),
        (col("w").cast("double") / col("tw").cast("double")).as("temp_share"),
        (col("base_quota") + when(col("rk") <= col("l"), 1L).otherwise(0L)).as("quota"))
      .orderBy(col("source"))
  }

  // --------------------------------------------- q177 tokenizer fertility

  /** q177 — tokenizer fertility per language: characters per whitespace
    * word and subword-per-word fertility under the q32 BPE-ish regex
    * pre-tokenizer. THE number multilingual tokenizer design reads —
    * languages with high fertility pay more sequence length per word, and
    * budget allocation (q161/q167/q176) should see token counts, not doc
    * counts. All sums integer, scan-local; ratios are terminal
    * divisions. */
  def tokFertility(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docs.select(col("lang"), col("n_chars"),
        size(toks).cast("long").as("ws"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("sub"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("sub")).as("subword_tokens"))
      .select(col("lang"), col("n_docs"), col("chars"), col("ws_tokens"),
        col("subword_tokens"),
        (col("chars").cast("double") / col("ws_tokens").cast("double"))
          .as("chars_per_word"),
        (col("subword_tokens").cast("double") / col("ws_tokens").cast("double"))
          .as("fertility"))
      .orderBy(col("lang"))
  }

  // --------------------------------------------- q178 robust outlier docs

  /** q178 — MAD-based length outliers per source: docs whose |n_chars −
    * median| exceeds 3·MAD (the robust z-score gate that, unlike
    * mean/stddev, a single giant document cannot drag). Builds on q163's
    * exact rank-selected median/MAD; the worst offender per source is
    * identified with a window argmax (max dev, then min doc_id — integer
    * tie-break, no float argmax ambiguity).
    *
    * Scale shape: two rank selections (q163's shape) plus one broadcast
    * join of the 2-column stats frame back onto the scan and a
    * source-keyed aggregate. MAD = 0 groups (constant-length sources)
    * produce zero outliers by the strict inequality. */
  def robustOutliers(docs: DataFrame): DataFrame = {
    val c = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val r1 = docs.select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))).cast("long"))
    val med = r1.join(c, Seq("source"))
      .filter(col("rn") === expr("(n_docs + 1) DIV 2"))
      .select(col("source"), col("n_chars").as("median_chars"))
    val r2 = docs.join(broadcast(med), Seq("source"))
      .withColumn("ad", abs(col("n_chars") - col("median_chars")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("ad"), col("doc_id"))).cast("long"))
    val mad = r2.join(c, Seq("source"))
      .filter(col("rn") === expr("(n_docs + 1) DIV 2"))
      .select(col("source"), col("ad").as("mad_chars"))
    val flagged = docs.join(broadcast(med), Seq("source"))
      .join(broadcast(mad), Seq("source"))
      .withColumn("ad", abs(col("n_chars") - col("median_chars")))
      .withColumn("out", col("ad") > lit(3L) * col("mad_chars"))
    val wsrc = Window.partitionBy(col("source"))
    flagged
      .withColumn("mx", max(when(col("out"), col("ad"))).over(wsrc))
      .groupBy(col("source"), col("median_chars"), col("mad_chars"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("out"), 1L).otherwise(0L)).as("n_outliers"),
        max(when(col("out"), col("ad"))).as("max_abs_dev"),
        min(when(col("out") && col("ad") === col("mx"), col("doc_id")))
          .as("worst_doc_id"))
      .select(col("source"), col("n_docs"), col("median_chars"),
        col("mad_chars"), col("n_outliers"), col("max_abs_dev"),
        col("worst_doc_id"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------ q198

  /** Benford digit-d probability log10(1 + 1/d), computed ONCE on the
    * driver and embedded as a literal in both engines (the oracle
    * interpolates the same Scala double, so cross-libm log10 variance
    * cannot split the engines). */
  private[operators] def benfordP(d: Int): Double = math.log10(1.0 + 1.0 / d)

  /** q198 — Benford's-law screen over `l_extendedprice`: the first-digit
    * distribution vs log10(1+1/d), with the chi-square distance — a
    * standard data-quality / fabrication screen for financial measures.
    * The leading digit is taken from the BIGINT rendering of
    * floor(price) (prices ≥ 1 by schema), NOT floor(log10(price)) —
    * integer-to-string is identical across engines while libm log10 can
    * differ by an ulp exactly at the power-of-ten boundaries this query
    * classifies on. All nine digits are emitted even at zero count
    * ((0−e)²/e = e — the q195 unobserved-cell rule); the chi² total is an
    * order-free fixed-point window sum repeated per row.
    *
    * Scale shape: one scan-local digit projection + one ≤9-key aggregate
    * + a 9-row broadcast grid join; corpus-linear, no data-sized shuffle
    * (the aggregate is partial+final on 9 keys). */
  def benford(s: SparkSession, lineitem: DataFrame): DataFrame = {
    import s.implicits._
    val digits = (1 to 9).map(d => (d.toLong, benfordP(d)))
      .toDF("digit", "benford_p")
    val obs = lineitem
      .select(substring(floor(col("l_extendedprice")).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = obs.agg(sum(col("n")).as("n_tot"))
    val term = {
      val e = col("n_tot").cast("double") * col("benford_p")
      (col("n").cast("double") - e) * (col("n").cast("double") - e) / e
    }
    val perDigit = broadcast(digits)
      .join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"), col("n_tot"),
        col("benford_p"))
      .select(col("digit"), col("n"), col("n_tot"), col("benford_p"),
        (col("n").cast("double") / col("n_tot").cast("double")).as("obs_frac"),
        term.as("chi2_term"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perDigit
      .withColumn("chi2_total",
        sum(floor(col("chi2_term") * lit(1e12)).cast("decimal(38,0)")).over(wAll)
          .cast("double") / lit(1e12))
      .orderBy(col("digit"))
  }

  // ------------------------------------------------------------------ q208

  /** PSI "significant shift" alert threshold (the industry-standard 0.2)
    * and the Laplace smoothing mass per bucket. */
  private[operators] val PsiThreshold = 0.2
  private[operators] val PsiSmooth = 0.5

  /** q208 — Population Stability Index of each source's length
    * distribution against the corpus: PSI = Σ_i (p_i−q_i)·ln(p_i/q_i)
    * over the log₂ length buckets (q166 binning) — the banking/ML-ops
    * drift score that complements q170's KS (PSI weights the WHOLE
    * distribution, KS only the worst point) and reads on the standard
    * 0.1/0.2 action thresholds.
    *
    * Determinism: bucket counts are exact integers; shares are Laplace-
    * smoothed with [[PsiSmooth]] over the corpus-observed bucket grid
    * (so log ratios are finite even where a source misses a bucket —
    * pinned, both engines); the per-bucket terms sum as floor(·1e15)
    * decimals, order-free.
    *
    * Scale shape: one scan-local bucket projection, one
    * (source, bucket) partial+final count, a broadcast corpus-bucket
    * grid join, a |sources|-key final aggregate. */
  def psiBySource(docs: DataFrame): DataFrame = {
    val bucket = (length(bin(col("n_chars"))) - lit(1)).cast("long")
    val cell = docs.select(col("source"), bucket.as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
    val corpus = cell.groupBy(col("bucket")).agg(sum(col("c")).as("cc"))
    val nB = corpus.agg(count(lit(1)).as("n_buckets"), sum(col("cc")).as("n_corpus"))
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    // dense (source x corpus-bucket) grid with zero fill
    val grid = perSource.crossJoin(broadcast(corpus))
      .join(cell, Seq("source", "bucket"), "left")
      .select(col("source"), col("n_docs"), col("bucket"), col("cc"),
        coalesce(col("c"), lit(0L)).as("c"))
      .crossJoin(broadcast(nB))
    val p = (col("c").cast("double") + lit(PsiSmooth)) /
      (col("n_docs").cast("double") + lit(PsiSmooth) * col("n_buckets").cast("double"))
    val q = (col("cc").cast("double") + lit(PsiSmooth)) /
      (col("n_corpus").cast("double") + lit(PsiSmooth) * col("n_buckets").cast("double"))
    val term = (p - q) * Pin.grid9(log(p / q))
    grid.groupBy(col("source"), col("n_docs"))
      .agg((sum(floor(term * lit(1e15)).cast("decimal(38,0)")).cast("double") /
        lit(1e15)).as("psi"))
      .select(col("source"), col("n_docs"), col("psi"),
        (col("psi") >= PsiThreshold).as("drifted"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------ q209

  /** q209's pinned order-statistic count. */
  private[operators] val HillK = 200

  /** q209 — Hill estimator of the document-length tail exponent (Hill
    * 1975): α̂ = k / Σ_{i≤k} ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k order
    * statistics — the heavy-tail diagnostic that says whether length
    * truncation/packing policy (q86/q132) is fighting a power law or a
    * thin tail, complementing q162's Zipf fit (token ranks) with the
    * DOCUMENT-length tail.
    *
    * Determinism: the top-(k+1) set is rank-selected with doc_id
    * tie-breaks; ln ratios are pinned double chains summed as
    * floor(·1e15) decimals (order-free); α is one terminal division,
    * NULL when the top k+1 values are all equal (H = 0 — pinned, no
    * division by zero reaches either engine).
    *
    * Scale shape: ORDER BY + LIMIT (k+1) plans as TakeOrderedAndProject
    * — per-partition top-(k+1) heaps merged on the driver, no global
    * sort; everything after runs on k+1 rows. */
  def hillTail(docs: DataFrame, k: Int = HillK): DataFrame = {
    val top = docs.select(col("n_chars"), col("doc_id"))
      .orderBy(col("n_chars").desc, col("doc_id")).limit(k + 1)
    val ref = top.agg(min(col("n_chars")).as("x_ref"))
    // rows AT x_ref (including the (k+1)-th itself) contribute ln(1) = 0,
    // so summing over all k+1 rows equals the Hill sum over the top k
    val lnTerm = Pin.grid9(
      log(col("n_chars").cast("double") / col("x_ref").cast("double")))
    top.crossJoin(broadcast(ref))
      .agg(max(col("x_ref")).as("x_ref"),
        (sum(floor(lnTerm * lit(1e15)).cast("decimal(38,0)")).cast("double") /
          lit(1e15)).as("ln_sum"))
      .select(lit(k.toLong).as("k"), col("x_ref"),
        (col("ln_sum") / lit(k.toDouble)).as("hill_h"),
        when(col("ln_sum") > 0.0, lit(k.toDouble) / col("ln_sum"))
          .otherwise(lit(null).cast("double")).as("alpha"))
  }

  // ------------------------------------------------------------------ q214

  /** q214 — 1-D earth-mover (Wasserstein-1) distance between each
    * source's length distribution and the corpus, over the q166/q208
    * log₂ buckets: on a unit-spaced grid W₁ = Σ_b |CDF_src(b) −
    * CDF_corpus(b)| — the magnitude-aware drift score that completes the
    * drift family (q170 KS = worst single point, q208 PSI = log-ratio
    * weighted, q172 JSD = symmetric entropy; EMD alone says HOW FAR the
    * mass moved, in bucket widths).
    *
    * Determinism: both CDFs are put over the common denominator
    * N_src·N_corpus, so every per-bucket term |cum_src·N_corp −
    * cum_corp·N_src| is an exact integer (decimal(38,0) — at petabyte
    * row counts the product exceeds a long), the sum is order-free, and
    * the ONLY float op is the one terminal division.
    *
    * Scale shape: identical to q208 — one scan-local bucket projection,
    * one (source, bucket) count, a broadcast corpus grid, a per-source
    * window cumsum over ≤64 buckets, one |sources|-key aggregate. */
  def emdDrift(docs: DataFrame): DataFrame = {
    val bucket = (length(bin(col("n_chars"))) - lit(1)).cast("long")
    val cell = docs.select(col("source"), bucket.as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
    val corpus = cell.groupBy(col("bucket")).agg(sum(col("c")).as("cc"))
    val nTot = corpus.agg(sum(col("cc")).as("n_corpus"))
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val grid = perSource.crossJoin(broadcast(corpus))
      .join(cell, Seq("source", "bucket"), "left")
      .select(col("source"), col("n_docs"), col("bucket"), col("cc"),
        coalesce(col("c"), lit(0L)).as("c"))
      .crossJoin(broadcast(nTot))
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
    val diff = abs(sum(col("c")).over(w).cast("decimal(38,0)") * col("n_corpus") -
      sum(col("cc")).over(w).cast("decimal(38,0)") * col("n_docs"))
    grid.select(col("source"), col("n_docs"), col("n_corpus"), diff.as("diff"))
      .groupBy(col("source"), col("n_docs"))
      .agg((sum(col("diff")).cast("double") /
        (col("n_docs").cast("double") * max(col("n_corpus")).cast("double")))
        .as("emd_buckets"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------- registry

  // ------------------------------------------------------- q229 Chao1

  /** q229 — Chao1 richness estimation per source over trigram types:
    * how many distinct trigrams does each source's POPULATION hold,
    * given what the sample showed? chao1 = V + F₁(F₁−1)/(2(F₂+1)) (the
    * bias-corrected form — defined even when no type was seen twice),
    * with completeness = V/chao1: the "have we sampled enough of this
    * source" gauge that complements q175's Heaps growth CURVE with a
    * point estimate of the asymptote.
    *
    * Exactness: V/F₁/F₂ are exact integers off one (source, trigram)
    * count; chao1 and completeness are one pinned terminal chain.
    * Scale shape: one scan-local n-gram explode into one (source,
    * trigram) count, then a |sources|-keyed aggregate. */
  def chao1(s: SparkSession, docs: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val cnt = docs
      .select(col("source"),
        explode(VectorFunctions.wordNgramList(col("text"), 3)).as("g"))
      .groupBy(col("source"), col("g")).agg(count(lit(1)).as("f"))
    val per = cnt.groupBy(col("source")).agg(
      count(lit(1)).as("v_obs"),
      sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"))
    val chao = col("v_obs").cast("double") +
      (col("f1") * (col("f1") - 1)).cast("double") /
        (lit(2L) * (col("f2") + 1)).cast("double")
    per.select(col("source"), col("v_obs"), col("f1"), col("f2"),
        chao.as("chao1"),
        (col("v_obs").cast("double") / chao).as("completeness"))
      .orderBy(col("source"))
  }

  // ---------------------------------------- q231 grouped jackknife SE

  /** q231 — delete-one-source jackknife for the corpus mean document
    * length: the CLUSTER-robust uncertainty estimate. q221's Poisson
    * bootstrap resamples documents independently, which understates the
    * error when documents within a source are correlated (they are —
    * source pipelines share generators); deleting whole sources is the
    * standard fix. θ₍ᵢ₎ = (S−Sᵢ)/(n−nᵢ) by integer subtraction — one
    * scan; SE² = (g−1)/g · Σ(θ₍ᵢ₎−θ̄)², computed on the 1e-9 grid so
    * the sum over sources is an exact integer (no float-order drift),
    * with deviations as g·tᵢ−Σt (no float mean enters). Also reports
    * the most influential source (argmax |deviation|, ties by name).
    *
    * Scale shape: one source-keyed aggregate; everything after runs on
    * the |sources|-bounded frame with two 1-row attaches. */
  def jackknifeSe(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_i"), sum(col("n_chars")).as("s_i"))
    val tot = per.agg(sum(col("n_i")).as("nt"), sum(col("s_i")).as("st"),
      count(lit(1)).as("g"))
    val loo = per.crossJoin(broadcast(tot))
      .select(col("source"), col("g"), col("nt"), col("st"),
        floor(((col("st") - col("s_i")).cast("double") /
          (col("nt") - col("n_i")).cast("double")) * lit(1e9)).cast("long")
          .as("t_i"))
    val m = loo.agg(sum(col("t_i").cast("decimal(19,0)")).as("t_sum"))
    val dev = loo.crossJoin(broadcast(m))
      .select(col("source"), col("g"), col("nt"), col("st"),
        (col("g") * col("t_i").cast("decimal(19,0)") - col("t_sum")).as("dev"))
    val w = Window.orderBy(abs(col("dev")).desc, col("source"))
    dev.withColumn("rk", row_number().over(w))
      .groupBy(col("g"), col("nt"), col("st"))
      .agg(sum(col("dev") * col("dev")).as("dev2"),
        max(when(col("rk") === 1, col("source"))).as("top_influence_source"))
      .select(col("g").as("n_sources"),
        (col("st").cast("double") / col("nt").cast("double")).as("mean_full"),
        (sqrt((col("g") - 1).cast("double") / col("g").cast("double") *
          col("dev2").cast("double")) /
          (col("g").cast("double") * lit(1e9))).as("jack_se"),
        col("top_influence_source"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q229_chao1" -> ((s, d) => chao1(s, Tables.documents(s, d))),
    "q231_jackknife_se" -> ((s, d) => jackknifeSe(Tables.documents(s, d))),
    "q214_emd_drift" -> ((s, d) => emdDrift(Tables.documents(s, d))),
    "q209_hill_tail" -> ((s, d) => hillTail(Tables.documents(s, d))),
    "q208_psi" -> ((s, d) => psiBySource(Tables.documents(s, d))),
    "q198_benford" -> ((s, d) => benford(s, Tables.lineitem(s, d))),
    "q172_js_divergence" -> ((s, d) => jsDivergence(Tables.documents(s, d))),
    "q173_k_anonymity" -> ((s, d) => kAnonymity(s, Tables.customer(s, d))),
    "q265_l_diversity" -> ((s, d) => lDiversity(s, Tables.customer(s, d))),
    "q281_t_closeness" -> ((s, d) => tCloseness(s, Tables.customer(s, d))),
    "q271_icc_source" -> ((s, d) => iccBySource(Tables.documents(s, d))),
    "q174_split_leakage" -> ((s, d) => splitLeakage(Tables.documents(s, d))),
    "q175_heaps_fit" -> ((s, d) => heapsFit(Tables.documents(s, d))),
    "q176_temp_mixture" -> ((s, d) => tempMixture(Tables.documents(s, d))),
    "q177_tok_fertility" -> ((s, d) => tokFertility(Tables.documents(s, d))),
    "q178_robust_outliers" -> ((s, d) => robustOutliers(Tables.documents(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q229_chao1" ->
      """WITH w AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |t AS (
        |  SELECT source, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                         for i in range(1, len(ws) - 1)]) AS g
        |  FROM w WHERE len(ws) >= 3),
        |c AS (SELECT source, g, CAST(count(*) AS BIGINT) AS f
        |      FROM t GROUP BY source, g),
        |per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS v_obs,
        |    CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM c GROUP BY source),
        |k AS (
        |  SELECT source, v_obs, f1, f2,
        |    CAST(v_obs AS DOUBLE)
        |      + CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE)
        |      AS chao1
        |  FROM per)
        |SELECT source, v_obs, f1, f2, chao1,
        |  CAST(v_obs AS DOUBLE) / chao1 AS completeness
        |FROM k ORDER BY source""".stripMargin,
    "q231_jackknife_se" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_i,
        |    CAST(sum(n_chars) AS BIGINT) AS s_i
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n_i) AS BIGINT) AS nt, CAST(sum(s_i) AS BIGINT) AS st,
        |    CAST(count(*) AS BIGINT) AS g
        |  FROM per),
        |loo AS (
        |  SELECT source, g, nt, st,
        |    CAST(floor((CAST(st - s_i AS DOUBLE) / CAST(nt - n_i AS DOUBLE))
        |      * 1.0e9) AS BIGINT) AS t_i
        |  FROM per CROSS JOIN tot),
        |m AS (SELECT sum(CAST(t_i AS HUGEINT)) AS t_sum FROM loo),
        |dev AS (
        |  SELECT source, g, nt, st, g * CAST(t_i AS HUGEINT) - t_sum AS dev
        |  FROM loo CROSS JOIN m),
        |r AS (SELECT *, row_number() OVER (ORDER BY abs(dev) DESC, source) AS rk
        |      FROM dev)
        |SELECT CAST(g AS BIGINT) AS n_sources,
        |  CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS mean_full,
        |  sqrt(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE)
        |      * CAST(sum(dev * dev) AS DOUBLE))
        |    / (CAST(g AS DOUBLE) * 1.0e9) AS jack_se,
        |  max(CASE WHEN rk = 1 THEN source END) AS top_influence_source
        |FROM r GROUP BY g, nt, st""".stripMargin,
    "q214_emd_drift" ->
      """WITH cell AS (
        |  SELECT source, CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |corpus AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cc
        |           FROM cell GROUP BY bucket),
        |nt AS (SELECT CAST(sum(cc) AS BIGINT) AS n_corpus FROM corpus),
        |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |       FROM documents GROUP BY source),
        |grid AS (
        |  SELECT ps.source, ps.n_docs, corpus.bucket, corpus.cc,
        |    COALESCE(cell.c, 0) AS c, nt.n_corpus
        |  FROM ps CROSS JOIN corpus
        |  LEFT JOIN cell ON cell.source = ps.source AND cell.bucket = corpus.bucket
        |  CROSS JOIN nt),
        |cum AS (
        |  SELECT source, n_docs, n_corpus,
        |    abs(CAST(sum(c) OVER (PARTITION BY source ORDER BY bucket) AS HUGEINT)
        |          * n_corpus
        |        - CAST(sum(cc) OVER (PARTITION BY source ORDER BY bucket) AS HUGEINT)
        |          * n_docs) AS diff
        |  FROM grid)
        |SELECT source, n_docs,
        |  CAST(sum(diff) AS DOUBLE)
        |    / (CAST(n_docs AS DOUBLE) * CAST(max(n_corpus) AS DOUBLE)) AS emd_buckets
        |FROM cum GROUP BY source, n_docs ORDER BY source""".stripMargin,
    "q209_hill_tail" ->
      s"""WITH top AS (
         |  SELECT n_chars FROM documents
         |  ORDER BY n_chars DESC, doc_id LIMIT ${HillK + 1}),
         |ref AS (SELECT CAST(min(n_chars) AS BIGINT) AS x_ref FROM top),
         |s AS (
         |  SELECT max(ref.x_ref) AS x_ref,
         |    CAST(sum(CAST(floor((floor(ln(CAST(n_chars AS DOUBLE)
         |      / CAST(ref.x_ref AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
         |      * 1.0e15) AS HUGEINT)) AS DOUBLE)
         |      / 1.0e15 AS ln_sum
         |  FROM top CROSS JOIN ref)
         |SELECT CAST($HillK AS BIGINT) AS k, x_ref,
         |  ln_sum / ${HillK.toDouble} AS hill_h,
         |  CASE WHEN ln_sum > 0.0 THEN ${HillK.toDouble} / ln_sum
         |    ELSE NULL END AS alpha
         |FROM s""".stripMargin,
    "q208_psi" ->
      s"""WITH cell AS (
         |  SELECT source, CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |corpus AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cc
         |           FROM cell GROUP BY bucket),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         |         CAST(sum(cc) AS BIGINT) AS n_corpus FROM corpus),
         |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |       FROM documents GROUP BY source),
         |grid AS (
         |  SELECT ps.source, ps.n_docs, corpus.bucket, corpus.cc,
         |    COALESCE(cell.c, 0) AS c, nb.n_buckets, nb.n_corpus
         |  FROM ps CROSS JOIN corpus
         |  LEFT JOIN cell ON cell.source = ps.source AND cell.bucket = corpus.bucket
         |  CROSS JOIN nb),
         |t AS (
         |  SELECT source, n_docs,
         |    ((CAST(c AS DOUBLE) + $PsiSmooth)
         |       / (CAST(n_docs AS DOUBLE) + $PsiSmooth * CAST(n_buckets AS DOUBLE))
         |     - (CAST(cc AS DOUBLE) + $PsiSmooth)
         |       / (CAST(n_corpus AS DOUBLE) + $PsiSmooth * CAST(n_buckets AS DOUBLE)))
         |    * (floor(ln(((CAST(c AS DOUBLE) + $PsiSmooth)
         |       / (CAST(n_docs AS DOUBLE) + $PsiSmooth * CAST(n_buckets AS DOUBLE)))
         |      / ((CAST(cc AS DOUBLE) + $PsiSmooth)
         |       / (CAST(n_corpus AS DOUBLE) + $PsiSmooth * CAST(n_buckets AS DOUBLE))))
         |      * 1.0e9 + 0.5) / 1.0e9)
         |      AS term
         |  FROM grid),
         |agg AS (
         |  SELECT source, n_docs,
         |    CAST(sum(CAST(floor(term * 1.0e15) AS HUGEINT)) AS DOUBLE) / 1.0e15
         |      AS psi
         |  FROM t GROUP BY source, n_docs)
         |SELECT source, n_docs, psi, psi >= $PsiThreshold AS drifted
         |FROM agg ORDER BY source""".stripMargin,
    "q198_benford" -> {
      val grid = (1 to 9)
        .map(d => s"($d, ${Pin.sqlDouble(benfordP(d))})").mkString(", ")
      s"""WITH g(digit, benford_p) AS (VALUES $grid),
         |obs AS (
         |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
         |      1, 1) AS BIGINT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM lineitem GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM obs),
         |pd AS (
         |  SELECT CAST(g.digit AS BIGINT) AS digit,
         |    COALESCE(obs.n, 0) AS n, tot.n_tot,
         |    CAST(g.benford_p AS DOUBLE) AS benford_p,
         |    CAST(COALESCE(obs.n, 0) AS DOUBLE) / CAST(tot.n_tot AS DOUBLE) AS obs_frac,
         |    (CAST(COALESCE(obs.n, 0) AS DOUBLE)
         |       - CAST(tot.n_tot AS DOUBLE) * CAST(g.benford_p AS DOUBLE))
         |    * (CAST(COALESCE(obs.n, 0) AS DOUBLE)
         |       - CAST(tot.n_tot AS DOUBLE) * CAST(g.benford_p AS DOUBLE))
         |    / (CAST(tot.n_tot AS DOUBLE) * CAST(g.benford_p AS DOUBLE)) AS chi2_term
         |  FROM g LEFT JOIN obs ON obs.digit = g.digit CROSS JOIN tot)
         |SELECT digit, n, n_tot, benford_p, obs_frac, chi2_term,
         |  CAST(sum(CAST(floor(chi2_term * 1.0e12) AS HUGEINT)) OVER () AS DOUBLE)
         |    / 1.0e12 AS chi2_total
         |FROM pd ORDER BY digit""".stripMargin
    },
    // identical difference-paired ln terms, fixed-point HUGEINT sums,
    // shared-mass correction with single terminal divisions
    "q172_js_divergence" ->
      """WITH u AS (
        |  SELECT source, tk.w AS word, CAST(count(*) AS BIGINT) AS c
        |  FROM documents, unnest(regexp_split_to_array(trim(text), '\s+')) tk(w)
        |  GROUP BY source, tk.w),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM u GROUP BY source),
        |j AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    a.c AS ia, b.c AS ib, ta.tot AS ita, tb.tot AS itb,
        |    CAST(a.c AS DOUBLE) AS ca, CAST(b.c AS DOUBLE) AS cb,
        |    CAST(ta.tot AS DOUBLE) AS ta, CAST(tb.tot AS DOUBLE) AS tb
        |  FROM u a JOIN u b ON a.word = b.word AND a.source < b.source
        |  JOIN t ta ON ta.source = a.source
        |  JOIN t tb ON tb.source = b.source),
        |s AS (
        |  SELECT src_a, src_b, ita, itb,
        |    CAST(count(*) AS BIGINT) AS shared_words,
        |    CAST(sum(ia) AS BIGINT) AS sa, CAST(sum(ib) AS BIGINT) AS sb,
        |    sum(CAST(floor(
        |      ((ca / ta / 2.0) *
        |        (floor(ln(2.0 * ca * tb) * 1.0e9 + 0.5) / 1.0e9
        |         - floor(ln(ca * tb + cb * ta) * 1.0e9 + 0.5) / 1.0e9)
        |       + (cb / tb / 2.0) *
        |        (floor(ln(2.0 * cb * ta) * 1.0e9 + 0.5) / 1.0e9
        |         - floor(ln(ca * tb + cb * ta) * 1.0e9 + 0.5) / 1.0e9))
        |      * 1.0e15) AS HUGEINT)) AS fsum
        |  FROM j GROUP BY src_a, src_b, ita, itb)
        |SELECT src_a, src_b, shared_words,
        |  0.6931471805599453e0 * ((1.0 - CAST(sa AS DOUBLE) / CAST(ita AS DOUBLE))
        |           + (1.0 - CAST(sb AS DOUBLE) / CAST(itb AS DOUBLE))) / 2.0
        |  + CAST(fsum AS DOUBLE) / 1.0e15 AS jsd
        |FROM s ORDER BY src_a, src_b""".stripMargin,
    "q173_k_anonymity" ->
      s"""WITH cls AS (
         |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS sz
         |  FROM customer GROUP BY c_nationkey, c_mktsegment),
         |ks AS (SELECT CAST(v.k AS INT) AS k
         |       FROM (VALUES ${KThresholds.map(k => s"($k)").mkString(", ")}) v(k))
         |SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(sz) AS BIGINT) AS n_rows,
         |  CAST(min(sz) AS BIGINT) AS min_class,
         |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
         |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT) AS rows_below,
         |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(sz) AS DOUBLE) AS at_risk_frac
         |FROM cls CROSS JOIN ks GROUP BY k ORDER BY k""".stripMargin,
    "q265_l_diversity" ->
      s"""WITH cls AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    CAST(count(*) AS BIGINT) AS sz,
         |    CAST(count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT))
         |      AS BIGINT) AS l
         |  FROM customer GROUP BY c_nationkey, c_mktsegment),
         |ls AS (SELECT CAST(v.l AS INT) AS l_min
         |       FROM (VALUES ${LThresholds.map(l => s"($l)").mkString(", ")}) v(l))
         |SELECT l_min, CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(sz) AS BIGINT) AS n_rows,
         |  CAST(min(l) AS BIGINT) AS min_l,
         |  CAST(sum(CASE WHEN l < l_min THEN 1 ELSE 0 END) AS BIGINT)
         |    AS classes_below,
         |  CAST(sum(CASE WHEN l < l_min THEN sz ELSE 0 END) AS BIGINT)
         |    AS rows_below,
         |  CAST(sum(CASE WHEN l < l_min THEN sz ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(sz) AS DOUBLE) AS at_risk_frac
         |FROM cls CROSS JOIN ls GROUP BY l_min ORDER BY l_min""".stripMargin,
    "q281_t_closeness" ->
      s"""WITH sv AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS sv
         |  FROM customer),
         |cls AS (SELECT c_nationkey, c_mktsegment,
         |          CAST(count(*) AS BIGINT) AS sz
         |        FROM sv GROUP BY 1, 2),
         |gband AS (SELECT sv, CAST(count(*) AS BIGINT) AS g FROM sv GROUP BY 1),
         |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nt,
         |               CAST(count(*) AS BIGINT) AS m FROM gband),
         |cells AS (SELECT c_nationkey, c_mktsegment, sv,
         |            CAST(count(*) AS BIGINT) AS cnt
         |          FROM sv GROUP BY 1, 2, 3),
         |grid AS (
         |  SELECT cls.c_nationkey, cls.c_mktsegment, cls.sz,
         |    gband.sv, gband.g, coalesce(cells.cnt, 0) AS cnt
         |  FROM cls CROSS JOIN gband
         |  LEFT JOIN cells ON cells.c_nationkey = cls.c_nationkey
         |    AND cells.c_mktsegment = cls.c_mktsegment AND cells.sv = gband.sv),
         |pre AS (
         |  SELECT *,
         |    sum(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
         |      ORDER BY sv) AS cumc,
         |    sum(g) OVER (PARTITION BY c_nationkey, c_mktsegment
         |      ORDER BY sv) AS cumg
         |  FROM grid),
         |pc AS (
         |  SELECT c_nationkey, c_mktsegment, max(sz) AS sz,
         |    CAST(sum(abs(cumc * nt - cumg * sz)) AS BIGINT) AS dnum,
         |    max(nt) AS nt, max(m) AS m
         |  FROM pre CROSS JOIN tot GROUP BY 1, 2),
         |pt AS (SELECT *, CAST(dnum AS DOUBLE)
         |         / CAST(sz * nt * (m - 1) AS DOUBLE) AS t_dist FROM pc),
         |th AS (SELECT unnest([${TThresholds.mkString(", ")}]) AS t_max)
         |SELECT t_max, CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(sz) AS BIGINT) AS n_rows, max(t_dist) AS max_t,
         |  CAST(sum(CASE WHEN t_dist > t_max THEN 1 ELSE 0 END) AS BIGINT)
         |    AS classes_above,
         |  CAST(sum(CASE WHEN t_dist > t_max THEN sz ELSE 0 END) AS BIGINT)
         |    AS rows_above,
         |  CAST(sum(CASE WHEN t_dist > t_max THEN sz ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(sz) AS DOUBLE) AS at_risk_frac
         |FROM pt CROSS JOIN th GROUP BY t_max ORDER BY t_max""".stripMargin,
    // exact integer moments; the per-group ratio sum rides the q158
    // fixed-point floor(·1e6) HUGEINT trick; mirrored double dag after
    "q271_icc_source" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ng,
        |    sum(CAST(n_chars AS HUGEINT)) AS sxg,
        |    sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sxxg
        |  FROM documents GROUP BY source),
        |f AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |    CAST(sum(ng) AS BIGINT) AS n_docs,
        |    sum(sxg) AS sx, sum(sxxg) AS sxx,
        |    sum(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT)) AS sng2,
        |    sum(CAST(floor(CAST(sxg AS DOUBLE) * CAST(sxg AS DOUBLE)
        |      / CAST(ng AS DOUBLE) * 1.0e6) AS HUGEINT)) AS tdec
        |  FROM g),
        |c AS (
        |  SELECT n_docs, n_sources,
        |    (CAST(tdec AS DOUBLE) / 1.0e6
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        / CAST(n_docs AS DOUBLE)) / (CAST(n_sources AS DOUBLE) - 1.0)
        |      AS ms_between,
        |    (CAST(sxx AS DOUBLE) - CAST(tdec AS DOUBLE) / 1.0e6)
        |      / (CAST(n_docs AS DOUBLE) - CAST(n_sources AS DOUBLE))
        |      AS ms_within,
        |    (CAST(n_docs AS DOUBLE)
        |      - CAST(sng2 AS DOUBLE) / CAST(n_docs AS DOUBLE))
        |      / (CAST(n_sources AS DOUBLE) - 1.0) AS k0
        |  FROM f)
        |SELECT n_docs, n_sources, ms_between, ms_within, k0,
        |  (ms_between - ms_within)
        |    / (ms_between + (k0 - 1.0) * ms_within) AS icc
        |FROM c""".stripMargin,
    "q174_split_leakage" ->
      """WITH d AS (SELECT doc_id, md5(text) AS ck FROM documents),
        |n AS (
        |  SELECT ck, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nt
        |  FROM d GROUP BY ck),
        |c AS (
        |  SELECT ck, m,
        |    CASE WHEN substring(md5(ck), 1, 1) < '8' THEN m ELSE 0 END AS ct
        |  FROM n)
        |SELECT 'doc_hash' AS policy,
        |  CAST(sum(nt) AS BIGINT) AS train_docs,
        |  CAST(sum(m - nt) AS BIGINT) AS val_docs,
        |  CAST(sum(nt * (m - nt)) AS BIGINT) AS leaked_pairs
        |FROM n
        |UNION ALL
        |SELECT 'cluster_hash' AS policy,
        |  CAST(sum(ct) AS BIGINT) AS train_docs,
        |  CAST(sum(m - ct) AS BIGINT) AS val_docs,
        |  CAST(sum(ct * (m - ct)) AS BIGINT) AS leaked_pairs
        |FROM c
        |ORDER BY policy""".stripMargin,
    // q162's fixed-point OLS over the windowed cumulative curve
    "q175_heaps_fit" ->
      """WITH w AS (
        |  SELECT source, doc_id, tk.w AS word
        |  FROM documents, unnest(regexp_split_to_array(trim(text), '\s+')) tk(w)),
        |tokd AS (
        |  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS ntok
        |  FROM w GROUP BY source, doc_id),
        |newd AS (
        |  SELECT source, fdoc AS doc_id, CAST(count(*) AS BIGINT) AS nw
        |  FROM (SELECT source, word, min(doc_id) AS fdoc
        |        FROM w GROUP BY source, word)
        |  GROUP BY source, fdoc),
        |cum AS (
        |  SELECT t.source,
        |    sum(t.ntok) OVER (PARTITION BY t.source ORDER BY t.doc_id) AS ct,
        |    sum(coalesce(n.nw, 0)) OVER (PARTITION BY t.source ORDER BY t.doc_id) AS cv
        |  FROM tokd t LEFT JOIN newd n ON n.source = t.source AND n.doc_id = t.doc_id),
        |m AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    sum(CAST(floor((floor(ln(CAST(ct AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9) * 1.0e15) AS HUGEINT)) AS sx,
        |    sum(CAST(floor((floor(ln(CAST(cv AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9) * 1.0e15) AS HUGEINT)) AS sy,
        |    sum(CAST(floor((floor(ln(CAST(ct AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9) * (floor(ln(CAST(cv AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9) * 1.0e15) AS HUGEINT)) AS sxy,
        |    sum(CAST(floor((floor(ln(CAST(ct AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9) * (floor(ln(CAST(ct AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9) * 1.0e15) AS HUGEINT)) AS sxx
        |  FROM cum GROUP BY source),
        |s AS (
        |  SELECT source, n_docs, CAST(n_docs AS DOUBLE) AS n,
        |    CAST(sx AS DOUBLE) / 1.0e15 AS dsx,
        |    CAST(sy AS DOUBLE) / 1.0e15 AS dsy,
        |    CAST(sxy AS DOUBLE) / 1.0e15 AS dsxy,
        |    CAST(sxx AS DOUBLE) / 1.0e15 AS dsxx
        |  FROM m)
        |SELECT source, n_docs,
        |  CASE WHEN n * dsxx - dsx * dsx = 0.0 THEN NULL
        |    ELSE (n * dsxy - dsx * dsy) / (n * dsxx - dsx * dsx) END AS beta,
        |  CASE WHEN n * dsxx - dsx * dsx = 0.0 THEN NULL
        |    ELSE floor(exp((dsy - ((n * dsxy - dsx * dsy)
        |      / (n * dsxx - dsx * dsx)) * dsx)
        |      / n) * 1.0e9 + 0.5) / 1.0e9 END AS k
        |FROM s ORDER BY source""".stripMargin,
    // integer micro-weights (floor(sqrt·1e6)) then q161's Hamilton
    "q176_temp_mixture" ->
      s"""WITH cells AS (
         |  SELECT source,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1.0e6) AS BIGINT) AS w
         |  FROM cells),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tn,
         |             CAST(sum(w) AS BIGINT) AS tw FROM w),
         |b AS (
         |  SELECT source, n_tokens, w,
         |    ($TempBudget * w) // t.tw AS base_quota,
         |    ($TempBudget * w) % t.tw AS rem,
         |    t.tn AS tn, t.tw AS tw
         |  FROM w CROSS JOIN t),
         |l AS (SELECT $TempBudget - sum(base_quota) AS l FROM b),
         |r AS (
         |  SELECT b.*, CAST(row_number() OVER (
         |    ORDER BY rem DESC, source) AS BIGINT) AS rk
         |  FROM b)
         |SELECT source, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(tn AS DOUBLE) AS natural_share,
         |  CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) AS temp_share,
         |  CAST(base_quota + CASE WHEN rk <= l.l THEN 1 ELSE 0 END AS BIGINT)
         |    AS quota
         |FROM r CROSS JOIN l ORDER BY source""".stripMargin,
    "q177_tok_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
        |    AS BIGINT) AS subword_tokens,
        |  CAST(sum(n_chars) AS DOUBLE)
        |    / CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
        |    AS chars_per_word,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
        |    AS DOUBLE)
        |    / CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
        |    AS fertility
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // q163's rank-selected median/MAD, strict 3·MAD gate, window argmax
    "q178_robust_outliers" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |r1 AS (
        |  SELECT source, n_chars, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn
        |  FROM documents),
        |med AS (
        |  SELECT r1.source, r1.n_chars AS median_chars
        |  FROM r1 JOIN c USING (source)
        |  WHERE r1.rn = (c.n_docs + 1) // 2),
        |r2 AS (
        |  SELECT d.source, abs(d.n_chars - med.median_chars) AS ad,
        |    CAST(row_number() OVER (
        |      PARTITION BY d.source
        |      ORDER BY abs(d.n_chars - med.median_chars), d.doc_id) AS BIGINT)
        |      AS rn
        |  FROM documents d JOIN med USING (source)),
        |mad AS (
        |  SELECT r2.source, r2.ad AS mad_chars
        |  FROM r2 JOIN c USING (source)
        |  WHERE r2.rn = (c.n_docs + 1) // 2),
        |f AS (
        |  SELECT d.source, d.doc_id, med.median_chars, mad.mad_chars,
        |    abs(d.n_chars - med.median_chars) AS ad,
        |    abs(d.n_chars - med.median_chars) > 3 * mad.mad_chars AS o
        |  FROM documents d JOIN med USING (source) JOIN mad USING (source)),
        |g AS (
        |  SELECT f.*, max(CASE WHEN o THEN ad END)
        |    OVER (PARTITION BY source) AS mx
        |  FROM f)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  median_chars, mad_chars,
        |  CAST(sum(CASE WHEN o THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(CASE WHEN o THEN ad END) AS max_abs_dev,
        |  min(CASE WHEN o AND ad = mx THEN doc_id END) AS worst_doc_id
        |FROM g GROUP BY source, median_chars, mad_chars
        |ORDER BY source""".stripMargin
  )
}
