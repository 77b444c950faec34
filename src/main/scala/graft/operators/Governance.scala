package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Pin
import graft.core.Tables
import graft.functions.TextFunctions

/** Data-governance operators a production training-data pipeline runs over
  * every corpus release: PII scanning/redaction, language-balanced quota
  * apportionment, Zipf-fit distribution diagnostics, and robust
  * (median/MAD) per-source statistics.
  */
object Governance {

  // ------------------------------------------------------------- q160 PII

  /** The standard structured-PII patterns (the C4/Dolma-style scrub list),
    * written in the regex subset Java, RE2 and DuckDB all scan
    * identically: no backreferences, no lookaround. */
  private[graft] val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhonePat = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  private[graft] val Ipv4Pat = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** Redact all three PII classes (emails first: their dotted domains
    * would otherwise feed the IP pattern's digit runs on corner cases). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "[EMAIL]"),
        PhonePat, "[PHONE]"),
      Ipv4Pat, "[IP]")

  private def hits(pat: String): Column =
    size(regexp_extract_all(col("text"), lit(pat), lit(0)))

  private def matchedChars(pat: String): Column =
    aggregate(transform(regexp_extract_all(col("text"), lit(pat), lit(0)),
      m => length(m)), lit(0), (acc, x) => acc + x)

  /** q160 — per-source PII exposure report: hit counts per class, how many
    * docs carry any PII, and the total matched characters a redaction pass
    * would replace. The release-gate report every corpus ships with.
    *
    * Scale shape: every count is scan-local (three regex scans per doc,
    * zero shuffles before the source-keyed partial+final aggregate).
    * Counts are integers; the class patterns avoid every regex feature
    * whose semantics differ across engines, and match lengths sum
    * order-free. The synthetic corpus is PII-free — the oracle pins
    * engine parity on the zero case, and GovernanceSpec pins the match +
    * redaction semantics on PII-bearing fixtures. */
  def piiScan(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        hits(EmailPat).as("e"), hits(PhonePat).as("p"), hits(Ipv4Pat).as("i"),
        (matchedChars(EmailPat) + matchedChars(PhonePat) + matchedChars(Ipv4Pat))
          .as("mc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("e")).as("email_hits"),
        sum(col("p")).as("phone_hits"),
        sum(col("i")).as("ipv4_hits"),
        sum(when(col("e") + col("p") + col("i") > 0, 1L).otherwise(0L))
          .as("docs_with_pii"),
        sum(col("mc").cast("long")).as("matched_chars"))
      .orderBy(col("source"))

  // ----------------------------------------------------- q161 lang quota

  /** q161's pinned global document budget. */
  private[graft] val QuotaBudget = 200L

  /** q161 — language-balanced quota apportionment: split a global doc
    * budget across (source, lang) cells proportionally to their character
    * mass, EXACTLY, via Hamilton's largest-remainder method (the
    * apportionment standard — public): base = (B·w) div T per cell, and
    * the B − Σbase leftover seats go to the cells with the largest
    * remainders (B·w) mod T, ties broken (source, lang) ascending. The
    * allocation a multilingual sampling pass then draws per cell.
    *
    * Exactness: pure integer div/mod — no float shares, so quotas sum to
    * EXACTLY B at any parallelism and any engine (float proportional
    * allocation loses or gains a seat under reordering; the spec pins the
    * sum). B·w needs decimals only past ~4e16 chars per cell at this B —
    * documented, not guarded (q150 convention).
    *
    * Scale shape: one source×lang aggregate (bounded cells), one tiny
    * single-partition window over the cells, broadcast total. Corpus-sized
    * work is the one scan feeding the aggregate. */
  def langQuota(docs: DataFrame, budget: Long = QuotaBudget): DataFrame = {
    val cells = docs.groupBy(col("source"), col("lang"))
      .agg(sum(col("n_chars")).cast("long").as("w"))
    val total = cells.agg(sum(col("w")).cast("long").as("t"))
    val based = cells.crossJoin(broadcast(total))
      .withColumn("base_quota", expr(s"($budget * w) DIV t"))
      .withColumn("rem", expr(s"($budget * w) % t"))
    val leftover = based.agg((lit(budget) - sum(col("base_quota"))).as("l"))
    val wr = Window.orderBy(col("rem").desc, col("source"), col("lang"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(wr).cast("long"))
      .select(col("source"), col("lang"), col("w").as("weight_chars"),
        col("base_quota"),
        (col("base_quota") + when(col("rk") <= col("l"), 1L).otherwise(0L))
          .as("quota"))
      .orderBy(col("source"), col("lang"))
  }

  // ------------------------------------------------------- q162 Zipf fit

  /** q162 — per-source Zipf-fit diagnostics: OLS slope/intercept of
    * ln(freq) on ln(rank) over the source's token-frequency table. Natural
    * corpora fit slope ≈ −1 (Zipf 1949 — public); templated/synthetic/
    * boilerplate-heavy sources flatten or steepen, making the slope a
    * cheap per-source quality flag next to q137's data card.
    *
    * Determinism (the q158 convention): each OLS moment Σln-term is
    * floor(term·1e15) summed in decimal(38,0) — order-free, exact — and
    * the slope/intercept arithmetic after the four exact sums is ONE
    * identical IEEE double chain in both engines. Ranks are
    * (freq desc, token asc) row_numbers: deterministic at any parallelism.
    * Bound: |ln·ln|·1e15 < 2e17 per term ⇒ decimal38 holds to ~5e20
    * terms.
    *
    * Scale shape: one token-keyed partial+final count (vocab-bounded after
    * map-side combine), one per-source rank window over vocab-sized
    * frames, one source-keyed moment aggregate. Corpus-sized work is the
    * token scan only. */
  def zipfFit(docs: DataFrame): DataFrame = {
    val freqs = docs
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
    val wr = Window.partitionBy(col("source")).orderBy(col("f").desc, col("w"))
    val xy = freqs.withColumn("r", row_number().over(wr).cast("long"))
      .select(col("source"),
        Pin.grid9(log(col("r").cast("double"))).as("x"),
        Pin.grid9(log(col("f").cast("double"))).as("y"))
    def fx(c: Column): Column =
      sum(floor(c * lit(1e15)).cast("decimal(38,0)"))
    val m = xy.groupBy(col("source")).agg(
      count(lit(1)).cast("long").as("n_terms"),
      fx(col("x")).as("sx"), fx(col("y")).as("sy"),
      fx(col("x") * col("y")).as("sxy"), fx(col("x") * col("x")).as("sxx"))
    val n = col("n_terms").cast("double")
    def d(c: Column): Column = c.cast("double") / lit(1e15)
    val denom = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val slope = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / denom
    m.select(col("source"), col("n_terms"),
        when(denom === 0.0, lit(null).cast("double")).otherwise(slope).as("slope"),
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise((d(col("sy")) - slope * d(col("sx"))) / n).as("intercept"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------- q163 robust stats

  /** q163 — per-source robust location/spread: the exact lower median of
    * doc length and the median absolute deviation around it (the
    * outlier-resistant pair a filtering pass thresholds against, immune to
    * the handful of giant documents that wreck mean/stddev cuts).
    *
    * Exactness: both medians are ELEMENT SELECTIONS, not interpolations —
    * the value at rank (n+1) div 2 under (value, doc_id) order — so the
    * result is an actual corpus value, integer-exact, identical ranks in
    * both engines (DuckDB's median() interpolates on even counts; the
    * oracle uses the same row_number formulation instead).
    *
    * Scale shape: two per-source rank windows (source-partitioned, no
    * global sort) + two broadcast joins of one-row-per-source medians;
    * everything partial+final on the source key. */
  def robustStats(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).cast("long").as("n_docs"))
    val w1 = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val med = docs.withColumn("rn", row_number().over(w1).cast("long"))
      .join(broadcast(counts), "source")
      .filter(col("rn") === expr("(n_docs + 1) DIV 2"))
      .select(col("source"), col("n_chars").as("median_chars"))
    val dev = docs.join(broadcast(med), "source")
      .withColumn("ad", abs(col("n_chars") - col("median_chars")))
    val w2 = Window.partitionBy(col("source")).orderBy(col("ad"), col("doc_id"))
    val mad = dev.withColumn("rn", row_number().over(w2).cast("long"))
      .join(broadcast(counts), "source")
      .filter(col("rn") === expr("(n_docs + 1) DIV 2"))
      .select(col("source"), col("ad").as("mad_chars"))
    counts.join(med, "source").join(mad, "source")
      .select(col("source"), col("n_docs"), col("median_chars"), col("mad_chars"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------ registry

  // --------------------------------------------- q194 Welch's t-test

  /** q194 — Welch's t statistic (+ Welch–Satterthwaite dof) for each
    * source's document-length mean against the REST of the corpus: the
    * "is this source's length distribution off?" significance screen
    * that complements q170's distribution-free KS (KS sees shape; t
    * sees means with unequal variances). Sufficient statistics are
    * exact BIGINTs (n, Σx, Σx²; rest-of-corpus = corpus − source, pure
    * integer subtraction — ONE scan, no self-join), and t/dof are one
    * terminal IEEE chain per source. |sources| rows of arithmetic after
    * one aggregate. */
  def welchT(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n1"), sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("q1"))
    val tot = per.agg(sum(col("n1")).as("nt"), sum(col("s1")).as("st"),
      sum(col("q1")).as("qt"))
    val j = per.crossJoin(broadcast(tot))
      .withColumn("n2", col("nt") - col("n1"))
      .withColumn("s2", col("st") - col("s1"))
      .withColumn("q2", col("qt") - col("q1"))
    def meanOf(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def varOf(q: Column, s: Column, n: Column) =
      (q.cast("double") - s.cast("double") * s.cast("double") / n.cast("double")) /
        (n.cast("double") - lit(1.0))
    val m1 = meanOf(col("s1"), col("n1")); val m2 = meanOf(col("s2"), col("n2"))
    val se1 = varOf(col("q1"), col("s1"), col("n1")) / col("n1").cast("double")
    val se2 = varOf(col("q2"), col("s2"), col("n2")) / col("n2").cast("double")
    j.select(col("source"), col("n1").as("n_docs"),
        (m1 - m2).as("mean_diff"),
        ((m1 - m2) / sqrt(se1 + se2)).as("t_stat"),
        (((se1 + se2) * (se1 + se2)) /
          (se1 * se1 / (col("n1").cast("double") - lit(1.0)) +
            se2 * se2 / (col("n2").cast("double") - lit(1.0)))).as("welch_dof"))
      .orderBy(col("source"))
  }

  // --------------------------------------- q195 chi-square independence

  /** q195 — chi-square test of independence for the lang × source
    * contingency table (+ Cramér's V effect size): the "is language mix
    * uniform across sources?" release check behind the q161 quotas.
    * Cell counts and marginals are exact integers; each cell's
    * (o−e)²/e term is one IEEE chain summed as floor(term·1e12)
    * decimals (order-free over R·C cells); dof is pure integer. One
    * (lang, source) aggregate — the table is category-bounded, never
    * corpus-sized. */
  def chi2Independence(docs: DataFrame): DataFrame = {
    val cells = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
    val cols = cells.groupBy(col("source")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("r"), countDistinct(col("source")).as("c"))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double")
    val o = coalesce(col("o"), lit(0L))
    val term = (o.cast("double") - e) * (o.cast("double") - e) / e
    // full R×C grid: unobserved cells contribute (0−e)²/e = e — dropping
    // them understates χ² exactly where the mix is most skewed
    rows.crossJoin(cols)
      .join(cells, Seq("lang", "source"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col("n"), col("r"), col("c"))
      .agg((sum(floor(term * lit(1e12)).cast("decimal(38,0)")).cast("double") /
        lit(1e12)).as("chi2"))
      .select(col("n").as("n_docs"), col("r").as("n_langs"),
        col("c").as("n_sources"),
        ((col("r") - lit(1L)) * (col("c") - lit(1L))).as("dof"),
        col("chi2"),
        sqrt(col("chi2") / (col("n").cast("double") *
          least(col("r") - lit(1L), col("c") - lit(1L)).cast("double")))
          .as("cramers_v"))
  }

  // ----------------------------------------------- q225 Mann-Whitney U

  /** q225 — Mann-Whitney U (Wilcoxon rank-sum) test of each source's
    * document-length distribution vs the REST of the corpus: the
    * nonparametric complement to q194's Welch t — sensitive to location
    * shift without assuming normality, which synthetic-length and
    * power-law corpora violate. Tie-corrected normal approximation.
    *
    * Exactness: ranks never materialize per document — average ranks
    * come from the VALUE-level frame (2·avg-rank = 2·cum_before + cnt +
    * 1, a pure integer), so R₁, U₁, the tie term Σ(t³−t) and the
    * variance numerator n₁n₂(n³−n−Σ(t³−t)) are all exact
    * decimal/HUGEINT integers; z is one terminal double chain.
    *
    * Scale shape: one (value) count + one (source, value) count off the
    * same scan (map-side combinable); everything after runs on the
    * distinct-length-bounded frame (|values| ≪ corpus — lengths
    * concentrate), with one 1-row totals attach. The unpartitioned
    * cumulative window is |values|-bounded. */
  def mannWhitney(docs: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(19,0)")
    val vals = docs.select(col("source"), col("n_chars").as("v"))
    val byVal = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val wv = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranksV = byVal
      .withColumn("cumb", coalesce(sum(col("cnt")).over(wv), lit(0L)))
      .select(col("v"), col("cnt"),
        (lit(2L) * col("cumb") + col("cnt") + 1).as("r2"))
    val per = vals.groupBy(col("source"), col("v")).agg(count(lit(1)).as("cs"))
      .join(ranksV.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("source"))
      .agg(sum(col("cs")).as("n1"),
        sum(dec(col("cs")) * dec(col("r2"))).as("r1_2"))
    val tot = ranksV.agg(sum(col("cnt")).as("n"),
      sum(dec(col("cnt")) * dec(col("cnt")) * dec(col("cnt")) - dec(col("cnt")))
        .as("tt"))
    val j = per.crossJoin(broadcast(tot))
      .withColumn("n2", col("n") - col("n1"))
      .withColumn("u1_2", col("r1_2") - dec(col("n1")) * dec(col("n1") + 1))
      .withColumn("k",
        dec(col("n")) * dec(col("n")) * dec(col("n")) - dec(col("n")) - col("tt"))
    val zNum = (col("u1_2") - dec(col("n1")) * dec(col("n2"))).cast("double")
    val zDen = lit(2.0) * sqrt(
      col("n1").cast("double") * col("n2").cast("double") * col("k").cast("double")
        / (lit(12.0) * col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
    j.select(col("source"), col("n1").as("n_docs"),
        (col("u1_2").cast("double") / lit(2.0)).as("u"),
        when(col("n2") === 0 || col("k") <= 0, lit(null).cast("double"))
          .otherwise(zNum / zDen).as("z"))
      .orderBy(col("source"))
  }

  // -------------------------------------------- q227 blocklist audit

  /** q227's pinned blocklist. A real deployment loads thousands of terms;
    * the mechanism (substring occurrence count per pattern, per source)
    * is what the operator pins down. */
  private[graft] val Blocklist = Seq("spark", "hash", "merge", "sort", "scan")

  /** q227 — blocklist / content-filter audit: for every (source, pattern)
    * pair, how many documents contain the pattern as a substring, total
    * occurrence count, and the per-source hit rate — the report a corpus
    * release runs before gating on a term list (and the dry-run twin of
    * q64's redaction). Occurrences are counted by length delta under
    * non-overlapping replace — pure integer arithmetic on codegen'd
    * string builtins, no regex engine in the hot path.
    *
    * Scale shape: the pattern explode multiplies the scan by |patterns|
    * BEFORE the map-side-combinable (source, pattern) aggregate — rows
    * out of the scan stage are |patterns|·|docs| narrow integers, and the
    * shuffle carries only |sources|·|patterns| keys. For thousand-term
    * lists, batch patterns per pass or compile an Aho-Corasick expression
    * — the aggregate shape is unchanged. */
  def blocklistAudit(docs: DataFrame): DataFrame = {
    val pats = array(Blocklist.map(lit): _*)
    val e = docs
      .select(col("source"), col("text"), explode(pats).as("pattern"))
      .select(col("source"), col("pattern"),
        expr("(length(text) - length(replace(text, pattern))) div length(pattern)")
          .as("occ"))
    val per = e.groupBy(col("source"), col("pattern"))
      .agg(sum(when(col("occ") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(col("occ")).as("occurrences"))
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    per.join(broadcast(totals), Seq("source"))
      .select(col("source"), col("pattern"), col("n_docs"), col("n_docs_hit"),
        col("occurrences"),
        (col("n_docs_hit").cast("double") / col("n_docs").cast("double"))
          .as("hit_rate"))
      .orderBy(col("source"), col("pattern"))
  }

  // ------------------------------------- q240 trimmed / winsorized mean

  /** q240 — 10% two-sided trimmed and winsorized means of document
    * length per source: the robust location estimates between the
    * plain mean (outlier-dragged) and q163's median (throws away most
    * of the data). Trim drops the k = n div 10 smallest and largest
    * values; winsorize clamps them to the surviving boundary values —
    * the standard pair a release report quotes for heavy-tailed length
    * distributions.
    *
    * Exactness: ranks are integers (ties by doc_id), the boundary
    * values are exact picks at ranks k+1 and n−k, and all three means
    * are integer sums with one terminal division each.
    *
    * Scale shape: one per-source rank window over the scan (the same
    * shape as every per-source order statistic here), cached once for
    * the two aggregate passes; everything else is |sources|-keyed. */
  def trimmedStats(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val ranked = graft.core.CacheScope.cached(
      docs.select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rk", row_number().over(w))
        .join(broadcast(counts), Seq("source"))
        .withColumn("k", expr("n div 10")))
    val bounds = ranked.groupBy(col("source")).agg(
      max(col("n")).as("n"),
      sum(col("n_chars")).as("s_all"),
      sum(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
        col("n_chars")).otherwise(0L)).as("s_trim"),
      max(when(col("rk") === col("k") + 1, col("n_chars"))).as("lo_cut"),
      max(when(col("rk") === col("n") - col("k"), col("n_chars"))).as("hi_cut"))
    val winsor = ranked
      .join(broadcast(bounds.select(col("source"), col("lo_cut"), col("hi_cut"))),
        Seq("source"))
      .groupBy(col("source"))
      .agg(sum(greatest(col("lo_cut"), least(col("hi_cut"), col("n_chars"))))
        .as("s_winsor"))
    bounds.join(winsor, Seq("source"))
      .select(col("source"), col("n"), col("lo_cut"), col("hi_cut"),
        (col("s_all").cast("double") / col("n").cast("double")).as("mean"),
        (col("s_trim").cast("double") /
          (col("n") - lit(2L) * expr("n div 10")).cast("double")).as("trimmed_mean"),
        (col("s_winsor").cast("double") / col("n").cast("double"))
          .as("winsor_mean"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------- q254 DP release

  /** Differentially-private histogram release (q254): per-source document
    * counts with Laplace(1/ε) noise — the standard ε-DP mechanism for count
    * statistics (Dwork et al. 2006) a governance layer applies before
    * publishing corpus composition externally. Sensitivity of a disjoint
    * histogram is 1, so noise scale b = 1/ε.
    *
    * The noise is SEEDED: inverse-CDF Laplace on a uniform derived from the
    * cross-engine h60 hash of the bucket key, so the release is
    * reproducible and oracle-checkable (a production release would swap in
    * a drawn seed — one string literal). Determinism: u = (k+0.5)/2^20 with
    * k = h60 mod 2^20 is an exact dyadic rational (power-of-two divides),
    * so both engines hand libm a BIT-IDENTICAL ln argument in (0,1]; the
    * ln is grid-pinned per the round-11 transcendental rule, and every
    * other step (abs, multiply, add) is correctly-rounded IEEE. Scale: one
    * map-side-combined count aggregate; noise is a scalar expression on the
    * |sources|-bounded result. */
  def dpSourceCounts(docs: DataFrame, epsilon: Double = 1.0): DataFrame = {
    val negB = -1.0 / epsilon
    val k = TextFunctions.h60(concat(lit("dp:"), col("source"))) % lit(1048576L)
    val u = (k.cast("double") + lit(0.5)) / lit(1048576.0)
    val c = u - lit(0.5)
    val noise = lit(negB) * when(c < 0, lit(-1.0)).otherwise(lit(1.0)) *
      Pin.grid9(log(lit(1.0) - lit(2.0) * abs(c)))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select(col("source"),
        (col("n").cast("double") + noise).as("noisy_count"))
      .orderBy(col("source"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q254_dp_release" -> ((s, d) => dpSourceCounts(Tables.documents(s, d))),
    "q225_mann_whitney" -> ((s, d) => mannWhitney(Tables.documents(s, d))),
    "q240_trimmed_stats" -> ((s, d) => trimmedStats(Tables.documents(s, d))),
    "q227_blocklist" -> ((s, d) => blocklistAudit(Tables.documents(s, d))),
    "q194_welch_t" -> ((s, d) => welchT(Tables.documents(s, d))),
    "q195_chi2_indep" -> ((s, d) => chi2Independence(Tables.documents(s, d))),
    "q160_pii_scan" -> ((s, d) => piiScan(Tables.documents(s, d))),
    "q161_lang_quota" -> ((s, d) => langQuota(Tables.documents(s, d))),
    "q162_zipf_fit" -> ((s, d) => zipfFit(Tables.documents(s, d))),
    "q163_robust_stats" -> ((s, d) => robustStats(Tables.documents(s, d)))
  )

  def oracles: Map[String, String] = Map(
    // same seeded inverse-CDF Laplace: u is an exact dyadic rational from
    // the md5-h60 hash, the ln is grid-pinned, and -1/ε is the identical
    // driver-printed double literal
    "q254_dp_release" -> {
      val negB = Pin.sqlDouble(-1.0 / 1.0)
      s"""WITH n AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY source),
         |h AS (
         |  SELECT source, n,
         |    (CAST(CAST(('0x' || substr(md5('dp:' || source), 1, 15)) AS BIGINT)
         |       % 1048576 AS DOUBLE) + 0.5) / 1048576.0 AS u
         |  FROM n)
         |SELECT source,
         |  CAST(n AS DOUBLE) + ($negB) *
         |    (CASE WHEN u - 0.5 < 0 THEN -1.0 ELSE 1.0 END) *
         |    (${Pin.grid9Sql("ln(1.0 - 2.0 * abs(u - 0.5))")}) AS noisy_count
         |FROM h ORDER BY source""".stripMargin
    },
    "q240_trimmed_stats" ->
      """WITH ranked AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rk,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents),
        |rr AS (SELECT *, n // 10 AS k FROM ranked),
        |b AS (
        |  SELECT source, max(n) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s_all,
        |    CAST(sum(CASE WHEN rk > k AND rk <= n - k THEN n_chars ELSE 0 END)
        |      AS BIGINT) AS s_trim,
        |    max(CASE WHEN rk = k + 1 THEN n_chars END) AS lo_cut,
        |    max(CASE WHEN rk = n - k THEN n_chars END) AS hi_cut
        |  FROM rr GROUP BY source),
        |wv AS (
        |  SELECT rr.source,
        |    CAST(sum(greatest(b.lo_cut, least(b.hi_cut, rr.n_chars)))
        |      AS BIGINT) AS s_winsor
        |  FROM rr JOIN b USING (source)
        |  GROUP BY rr.source)
        |SELECT b.source, b.n, b.lo_cut, b.hi_cut,
        |  CAST(s_all AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean,
        |  CAST(s_trim AS DOUBLE) / CAST(b.n - 2 * (b.n // 10) AS DOUBLE)
        |    AS trimmed_mean,
        |  CAST(s_winsor AS DOUBLE) / CAST(b.n AS DOUBLE) AS winsor_mean
        |FROM b JOIN wv ON wv.source = b.source
        |ORDER BY b.source""".stripMargin,
    "q227_blocklist" ->
      s"""WITH p AS (
         |  SELECT unnest([${Blocklist.map(p => s"'$p'").mkString(", ")}]) AS pattern),
         |e AS (
         |  SELECT d.source, p.pattern,
         |    (length(d.text) - length(replace(d.text, p.pattern, '')))
         |      // length(p.pattern) AS occ
         |  FROM documents d CROSS JOIN p),
         |per AS (
         |  SELECT source, pattern,
         |    CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
         |    CAST(sum(occ) AS BIGINT) AS occurrences
         |  FROM e GROUP BY source, pattern),
         |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |      FROM documents GROUP BY source)
         |SELECT per.source, per.pattern, t.n_docs, per.n_docs_hit, per.occurrences,
         |  CAST(n_docs_hit AS DOUBLE) / CAST(t.n_docs AS DOUBLE) AS hit_rate
         |FROM per JOIN t USING (source) ORDER BY source, pattern""".stripMargin,
    "q225_mann_whitney" ->
      """WITH vals AS (SELECT source, n_chars AS v FROM documents),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM vals GROUP BY v),
        |rv AS (
        |  SELECT v, cnt,
        |    2 * COALESCE(sum(cnt) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt + 1 AS r2
        |  FROM bv),
        |per AS (
        |  SELECT source, CAST(sum(cs) AS BIGINT) AS n1,
        |    sum(CAST(cs AS HUGEINT) * CAST(r2 AS HUGEINT)) AS r1_2
        |  FROM (SELECT source, v, CAST(count(*) AS BIGINT) AS cs
        |        FROM vals GROUP BY source, v) sv
        |  JOIN rv USING (v)
        |  GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |    sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tt
        |  FROM rv),
        |j AS (
        |  SELECT source, n1, r1_2, n, tt, n - n1 AS n2,
        |    r1_2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1_2,
        |    CAST(n AS HUGEINT) * n * n - n - tt AS k
        |  FROM per CROSS JOIN tot)
        |SELECT source, n1 AS n_docs,
        |  CAST(u1_2 AS DOUBLE) / 2.0 AS u,
        |  CASE WHEN n2 = 0 OR k <= 0 THEN NULL ELSE
        |    CAST(u1_2 - CAST(n1 AS HUGEINT) * n2 AS DOUBLE) /
        |    (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(k AS DOUBLE)
        |      / (12.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))) END AS z
        |FROM j ORDER BY source""".stripMargin,
    // exact BIGINT sufficient statistics, rest-of-corpus by subtraction
    "q194_welch_t" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(n_chars) AS BIGINT) AS s1,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS q1
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n1) AS BIGINT) AS nt, CAST(sum(s1) AS BIGINT) AS st,
        |    CAST(sum(q1) AS BIGINT) AS qt
        |  FROM per),
        |j AS (
        |  SELECT per.*, tot.nt - per.n1 AS n2, tot.st - per.s1 AS s2,
        |    tot.qt - per.q1 AS q2
        |  FROM per CROSS JOIN tot),
        |f AS (
        |  SELECT source, n1,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |       / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))
        |      / CAST(n1 AS DOUBLE) AS se1,
        |    ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |       / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0))
        |      / CAST(n2 AS DOUBLE) AS se2,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
        |  FROM j)
        |SELECT source, n1 AS n_docs, m1 - m2 AS mean_diff,
        |  (m1 - m2) / sqrt(se1 + se2) AS t_stat,
        |  ((se1 + se2) * (se1 + se2)) /
        |  (se1 * se1 / (n1d - 1.0) + se2 * se2 / (n2d - 1.0)) AS welch_dof
        |FROM f ORDER BY source""".stripMargin,
    // full R×C grid incl. zero cells; floor(term·1e12) HUGEINT sum
    "q195_chi2_indep" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY lang, source),
        |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY lang),
        |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS r,
        |    CAST(count(DISTINCT source) AS BIGINT) AS c
        |  FROM cells),
        |g AS (
        |  SELECT r.lang, c.source, r.rt, c.ct, coalesce(cells.o, 0) AS o
        |  FROM r CROSS JOIN c
        |  LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source),
        |s AS (
        |  SELECT tot.n, tot.r, tot.c,
        |    sum(CAST(floor(
        |      (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |         / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |         / CAST(n AS DOUBLE))
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 1.0e12) AS HUGEINT)) AS sc
        |  FROM g CROSS JOIN tot GROUP BY tot.n, tot.r, tot.c)
        |SELECT n AS n_docs, r AS n_langs, c AS n_sources,
        |  (r - 1) * (c - 1) AS dof,
        |  CAST(sc AS DOUBLE) / 1.0e12 AS chi2,
        |  sqrt(CAST(sc AS DOUBLE) / 1.0e12 /
        |    (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))) AS cramers_v
        |FROM s""".stripMargin,
    "q160_pii_scan" ->
      s"""WITH h AS (
         |  SELECT source,
         |    len(regexp_extract_all(text, '$EmailPat')) AS e,
         |    len(regexp_extract_all(text, '$PhonePat')) AS p,
         |    len(regexp_extract_all(text, '$Ipv4Pat')) AS i,
         |    coalesce(list_sum(list_transform(
         |      regexp_extract_all(text, '$EmailPat'), m -> length(m))), 0)
         |    + coalesce(list_sum(list_transform(
         |      regexp_extract_all(text, '$PhonePat'), m -> length(m))), 0)
         |    + coalesce(list_sum(list_transform(
         |      regexp_extract_all(text, '$Ipv4Pat'), m -> length(m))), 0) AS mc
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(e) AS BIGINT) AS email_hits,
         |  CAST(sum(p) AS BIGINT) AS phone_hits,
         |  CAST(sum(i) AS BIGINT) AS ipv4_hits,
         |  CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_with_pii,
         |  CAST(sum(mc) AS BIGINT) AS matched_chars
         |FROM h GROUP BY source ORDER BY source""".stripMargin,
    "q161_lang_quota" ->
      s"""WITH cells AS (
         |  SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS w
         |  FROM documents GROUP BY source, lang),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM cells),
         |b AS (
         |  SELECT source, lang, w,
         |    ($QuotaBudget * w) // t.t AS base_quota,
         |    ($QuotaBudget * w) % t.t AS rem
         |  FROM cells CROSS JOIN t),
         |l AS (SELECT $QuotaBudget - sum(base_quota) AS l FROM b),
         |r AS (
         |  SELECT b.*, CAST(row_number() OVER (
         |    ORDER BY rem DESC, source, lang) AS BIGINT) AS rk
         |  FROM b)
         |SELECT source, lang, w AS weight_chars,
         |  CAST(base_quota AS BIGINT) AS base_quota,
         |  CAST(base_quota + CASE WHEN rk <= l.l THEN 1 ELSE 0 END AS BIGINT)
         |    AS quota
         |FROM r CROSS JOIN l ORDER BY source, lang""".stripMargin,
    "q162_zipf_fit" ->
      """WITH f AS (
        |  SELECT source, tk.w AS w, CAST(count(*) AS BIGINT) AS f
        |  FROM documents,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) tk(w)
        |  GROUP BY source, tk.w),
        |r AS (
        |  SELECT source,
        |    floor(ln(CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY f DESC, w) AS DOUBLE))
        |      * 1.0e9 + 0.5) / 1.0e9 AS x,
        |    floor(ln(CAST(f AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9 AS y
        |  FROM f),
        |m AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        |    sum(CAST(floor(x * 1.0e15) AS HUGEINT)) AS sx,
        |    sum(CAST(floor(y * 1.0e15) AS HUGEINT)) AS sy,
        |    sum(CAST(floor(x * y * 1.0e15) AS HUGEINT)) AS sxy,
        |    sum(CAST(floor(x * x * 1.0e15) AS HUGEINT)) AS sxx
        |  FROM r GROUP BY source),
        |s AS (
        |  SELECT source, n_terms,
        |    CAST(n_terms AS DOUBLE) AS n,
        |    CAST(sx AS DOUBLE) / 1.0e15 AS dsx,
        |    CAST(sy AS DOUBLE) / 1.0e15 AS dsy,
        |    CAST(sxy AS DOUBLE) / 1.0e15 AS dsxy,
        |    CAST(sxx AS DOUBLE) / 1.0e15 AS dsxx
        |  FROM m)
        |SELECT source, n_terms,
        |  CASE WHEN n * dsxx - dsx * dsx = 0.0 THEN NULL
        |    ELSE (n * dsxy - dsx * dsy) / (n * dsxx - dsx * dsx) END AS slope,
        |  CASE WHEN n * dsxx - dsx * dsx = 0.0 THEN NULL
        |    ELSE (dsy - ((n * dsxy - dsx * dsy) / (n * dsxx - dsx * dsx)) * dsx)
        |      / n END AS intercept
        |FROM s ORDER BY source""".stripMargin,
    "q163_robust_stats" ->
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
        |  WHERE r2.rn = (c.n_docs + 1) // 2)
        |SELECT c.source, c.n_docs, med.median_chars, mad.mad_chars
        |FROM c JOIN med USING (source) JOIN mad USING (source)
        |ORDER BY c.source""".stripMargin
  )
}
