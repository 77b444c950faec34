package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions

/** Quality-SIGNAL meta-analysis: do the pipeline's filter signals agree
  * (Spearman), how certain are its pass rates (Wilson), which exemplar
  * represents each label (prototypes), and a second independent
  * readability axis (Flesch-Kincaid proxy). All integer / fixed-point
  * exact against DuckDB.
  */
object Signals {

  // --------------------------------------- q185 signal rank correlation

  /** q185 — Spearman rank correlation, per source, between the heuristic
    * quality score (q31) and the corpus-bigram-LM score (q92): the
    * filter-agreement meta-check run before trusting either signal to
    * gate documents. ρ = Pearson on ranks; ranks are integers (ties
    * broken by doc_id — and both signal VALUES are bit-identical across
    * engines because q31/q92 hash-match), so every moment is an exact
    * BIGINT sum and ρ is one terminal IEEE chain.
    *
    * Scale shape: the LM side reuses q92's plan (scan-local bigrams, one
    * LM aggregate, one scoring join); ranking is two per-source window
    * sorts (docs-per-source rows); moments are one source-keyed
    * aggregate. Docs the LM cannot score (<2 bigrams) drop via the
    * inner join — documented, deterministic. */
  def signalRankCorr(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lm = Curation.lmScore(spark, docs).select(col("doc_id"), col("avg_logp"))
    val q = TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score"))
    val j = docs.select(col("source"), col("doc_id"))
      .join(lm, Seq("doc_id")).join(q, Seq("doc_id"))
    spearmanBySource(j)
  }

  /** Spearman ρ per source over any (source, doc_id, avg_logp,
    * quality_score) frame — integer rank moments, one terminal chain. */
  def spearmanBySource(j: DataFrame): DataFrame = {
    val wx = Window.partitionBy(col("source")).orderBy(col("avg_logp"), col("doc_id"))
    val wy = Window.partitionBy(col("source")).orderBy(col("quality_score"), col("doc_id"))
    val ranked = j
      .withColumn("rx", row_number().over(wx).cast("long"))
      .withColumn("ry", row_number().over(wy).cast("long"))
    val m = ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
    m.select(col("source"), col("n"),
        when(col("n") < 2, lit(null)).otherwise(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("spearman"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------ q186 Wilson intervals

  /** q186's pinned pass threshold and z (95% two-sided). */
  private[graft] val PassThreshold = 0.5
  private[graft] val WilsonZ = 1.96

  /** q186 — Wilson score confidence interval for the per-source quality
    * pass rate (q31 score ≥ 0.5): the uncertainty band a release report
    * puts around every filter rate, correct even at small n or extreme
    * rates (unlike the normal approximation). n and k are exact
    * integers; the interval is one pinned IEEE chain (z kept in DOUBLE
    * on both engines — DuckDB would otherwise fold 1.96² in exact
    * decimal). Scale shape: scan-local score + one source aggregate. */
  def wilsonPassRates(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score"))
    val agg = docs.select(col("source"), col("doc_id")).join(q, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("quality_score") >= PassThreshold, 1L).otherwise(0L)).as("k"))
    val n = col("n").cast("double"); val z = lit(WilsonZ)
    val phat = col("k").cast("double") / n
    val denom = lit(1.0) + z * z / n
    val center = phat + z * z / (lit(2.0) * n)
    val margin = z * sqrt(phat * (lit(1.0) - phat) / n + z * z / (lit(4.0) * n * n))
    agg.select(col("source"), col("n"), col("k"), phat.as("pass_rate"),
        ((center - margin) / denom).as("wilson_lo"),
        ((center + margin) / denom).as("wilson_hi"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------ q187 label prototypes

  /** q187 — prototype selection: the embedding nearest (squared
    * Euclidean) to its label centroid — the exemplar few-shot evals and
    * dataset cards quote per class. Exact without any float centroid:
    * on the 1e-9 grid, argmin_v Σ_d (xq_d·n − s1_d)² where s1 is the
    * per-(label, dim) integer component sum — the same objective as
    * distance-to-mean, scaled by n², every term an exact decimal(38,0).
    *
    * Scale shape: one posexplode scan, one (label, dim) integer sum
    * (64·|labels| keys, broadcast back), one (label, vec) distance
    * aggregate, one per-label window argmin. Corpus-linear; ties broken
    * by vec_id. */
  def labelPrototypes(embs: DataFrame): DataFrame = {
    val xq = floor(col("x").cast("double") * lit(1e9)).cast("long")
    val terms = embs
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("vec_id"), col("dim"), xq.as("xq"))
    val s1 = terms.groupBy(col("label"), col("dim")).agg(sum(col("xq")).as("s1"))
    val nPer = embs.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val diff = (col("xq") * col("n") - col("s1")).cast("decimal(38,0)")
    val d2 = terms
      .join(s1, Seq("label", "dim"))
      .join(broadcast(nPer), Seq("label"))
      .select(col("label"), col("vec_id"), col("n"), (diff * diff).as("t"))
      .groupBy(col("label"), col("vec_id"), col("n"))
      .agg(sum(col("t")).as("d2"))
    val w = Window.partitionBy(col("label")).orderBy(col("d2"), col("vec_id"))
    d2.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("label"), col("n"), col("vec_id").as("proto_vec_id"),
        (sqrt(col("d2").cast("double")) / col("n").cast("double") / lit(1e9))
          .as("proto_dist"))
      .orderBy(col("label"))
  }

  // ---------------------------------------------------- q188 readability

  /** q188 — Flesch-Kincaid-proxy readability per source: grade ≈
    * 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59, with
    * sentences as [.!?]+ runs (min 1) and syllables as vowel-group runs
    * — the standard heuristic on exactly countable proxies. A second,
    * independent axis next to q31's length/punctuation score (and a
    * q185-correlatable signal). Per-doc counts are scan-local integers;
    * the per-doc grade is one pinned IEEE chain summed as
    * floor(fk·1e12) decimals. */
  def readability(docs: DataFrame): DataFrame = {
    val words = size(TextFunctions.tokens(col("text"))).cast("long")
    val sents = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
    val sylls = size(regexp_extract_all(col("text"), lit("[aeiouyAEIOUY]+"), lit(0)))
      .cast("long")
    val fk = lit(0.39) * (col("w").cast("double") / col("s").cast("double")) +
      lit(11.8) * (col("v").cast("double") / col("w").cast("double")) - lit(15.59)
    docs.select(col("source"), words.as("w"), sents.as("s"), sylls.as("v"))
      .select(col("source"), col("w"), col("s"), col("v"), fk.as("fk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("words"),
        sum(col("s")).as("sentences"),
        sum(col("v")).as("syllables"),
        (sum(floor(col("fk") * lit(1e12)).cast("decimal(38,0)")).cast("double") /
          lit(1e12) / count(lit(1)).cast("double")).as("avg_fk_grade"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------ q226 Cohen's kappa

  /** q226 — Cohen's kappa between the two binary gate decisions the
    * pipeline's quality filters would make: rater A = heuristic quality
    * pass (q31 score ≥ [[PassThreshold]]), rater B = LM-fluency pass
    * (q92 avg_logp ≥ the corpus mean). The categorical-agreement
    * complement to q185's rank correlation of the same two signals —
    * "would the filters keep the SAME documents, beyond chance".
    *
    * Exactness: both signal values are bit-identical cross-engine (q31/
    * q92 hash-match); the LM threshold is applied as an integer
    * inequality on the 1e-12 grid (bq·n ≥ Σbq — no float mean enters),
    * the 2×2 contingency per source is exact integers, and po/pe/κ are
    * one pinned terminal chain. Docs the LM cannot score (<2 bigrams)
    * drop via the inner join, as in q185.
    *
    * Scale shape: q92's scan-local bigram plan + one source-keyed
    * aggregate with one 1-row corpus-threshold attach. */
  def qualityLmKappa(spark: SparkSession, dir: String): DataFrame =
    kappaOf(spark, Tables.documents(spark, dir))

  private[graft] def kappaOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    val lm = Curation.lmScore(spark, docs).select(col("doc_id"), col("avg_logp"))
    val q = TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score"))
    val scored = docs.select(col("source"), col("doc_id"))
      .join(lm, Seq("doc_id")).join(q, Seq("doc_id"))
      .select(col("source"),
        (col("quality_score") >= lit(PassThreshold)).as("a"),
        floor(col("avg_logp") * lit(1e12)).cast("long").as("bq"))
    val tot = scored.agg(sum(col("bq").cast("decimal(19,0)")).as("sb"),
      count(lit(1)).as("nb"))
    val flags = scored.crossJoin(broadcast(tot))
      .select(col("source"), col("a"),
        (col("bq").cast("decimal(19,0)") * col("nb") >= col("sb")).as("b"))
    val ct = flags.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
      sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = (dec(col("n11") + col("n10")) * dec(col("n11") + col("n01"))
      + dec(col("n01") + col("n00")) * dec(col("n10") + col("n00")))
      .cast("double") / (nD * nD)
    ct.select(col("source"), col("n"),
        col("n11"), col("n10"), col("n01"), col("n00"),
        po.as("po"), pe.as("pe"),
        when(pe === 1.0, lit(null).cast("double"))
          .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
      .orderBy(col("source"))
  }

  // -------------------------------------------- q243 Simpson's screen

  /** q243 — Simpson's-paradox screen on the quality~length relation:
    * the OLS slope of the q31 quality score against document length,
    * per source AND pooled, flagging sources whose slope sign opposes
    * the pooled one. The classic aggregation trap: a corpus-level
    * "longer is better" trend can reverse inside every source (or vice
    * versa), and any filter tuned on the pooled trend then mis-gates
    * per-source. Pooled moments are the SUM of the per-source moments
    * — one scan, one |sources| rollup, one 1-row attach.
    *
    * Exactness: y enters on the 1e-12 grid (q31 doubles are
    * bit-identical), so all five moments are exact integers; each
    * slope is one guarded terminal division (zero length-variance
    * sources pin to NULL — ANSI double division by zero throws, the
    * q213 lesson). */
  def simpsonSlopes(docs: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(19,0)")
    val q = TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score"))
    val j = docs.select(col("source"), col("doc_id"), col("n_chars"))
      .join(q, Seq("doc_id"))
      .select(col("source"), col("n_chars").as("x"),
        floor(col("quality_score") * lit(1e12)).cast("long").as("yq"))
    val per = j.groupBy(col("source")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(dec(col("yq"))).as("sy"),
      sum(dec(col("x")) * dec(col("yq"))).as("sxy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"))
    val pool = per.agg(sum(col("n")).as("pn"), sum(col("sx")).as("psx"),
      sum(col("sy")).as("psy"), sum(col("sxy")).as("psxy"),
      sum(col("sxx")).as("psxx"))
    def slopeOf(n: Column, sx: Column, sy: Column, sxy: Column,
                sxx: Column): Column = {
      val num = (dec(n) * sxy - dec(sx) * sy).cast("double")
      val den = (dec(n) * sxx - dec(sx) * dec(sx)).cast("double")
      when(den === 0.0, lit(null).cast("double"))
        .otherwise(num / den / lit(1e12))
    }
    val s = slopeOf(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"))
    val p = slopeOf(col("pn"), col("psx"), col("psy"), col("psxy"), col("psxx"))
    per.crossJoin(broadcast(pool))
      .select(col("source"), col("n"), s.as("slope"), p.as("pooled_slope"),
        when(s.isNull || p.isNull, lit(null).cast("boolean"))
          .otherwise(s * p < 0).as("sign_flip"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q226_cohens_kappa" -> (qualityLmKappa _),
    "q243_simpson" -> ((s, d) => simpsonSlopes(Tables.documents(s, d))),
    "q185_rank_corr" -> (signalRankCorr _),
    "q186_wilson_ci" -> ((s, d) => wilsonPassRates(Tables.documents(s, d))),
    "q187_label_prototypes" -> ((s, d) => labelPrototypes(Tables.embeddings(s, d))),
    "q188_readability" -> ((s, d) => readability(Tables.documents(s, d)))
  )

  /** q31's quality-score SQL fragment (per doc), verbatim from its
    * hash-matching oracle so the two stay value-identical. */
  private val QualitySql =
    """SELECT doc_id,
      |    least(1.0, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
      |      / 100.0) *
      |    (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |      / CAST(length(text) AS DOUBLE)) AS quality_score
      |  FROM documents""".stripMargin

  /** q92's LM-score CTE chain, verbatim (see Curation.oracles). */
  private val LmCtes =
    """w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    unnest([struct_pack(w1 := ws[i], w2 := ws[i+1])
      |            for i in range(1, len(ws))]) AS s
      |  FROM w WHERE len(ws) >= 2),
      |bb AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM b),
      |c AS (SELECT w1, w2, count(*) AS n FROM bb GROUP BY w1, w2),
      |tt AS (SELECT w1, sum(n) AS n_w1 FROM c GROUP BY w1),
      |lm AS (
      |  SELECT c.w1, c.w2,
      |    floor(ln(CAST(c.n AS DOUBLE) / CAST(tt.n_w1 AS DOUBLE))
      |      * 1.0e9 + 0.5) / 1.0e9 AS logp
      |  FROM c JOIN tt USING (w1)),
      |lmv AS (
      |  SELECT bb.doc_id,
      |    CAST(sum(CAST(lm.logp AS DECIMAL(25,15))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) AS avg_logp
      |  FROM bb JOIN lm USING (w1, w2)
      |  GROUP BY bb.doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q243_simpson" ->
      s"""WITH q AS (
         |  $QualitySql),
         |j AS (
         |  SELECT d.source, d.n_chars AS x,
         |    CAST(floor(q.quality_score * 1.0e12) AS BIGINT) AS yq
         |  FROM documents d JOIN q USING (doc_id)),
         |per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    sum(CAST(yq AS HUGEINT)) AS sy,
         |    sum(CAST(x AS HUGEINT) * yq) AS sxy,
         |    sum(CAST(x AS HUGEINT) * x) AS sxx
         |  FROM j GROUP BY source),
         |pool AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS pn, CAST(sum(sx) AS BIGINT) AS psx,
         |    sum(sy) AS psy, sum(sxy) AS psxy, sum(sxx) AS psxx
         |  FROM per),
         |k AS (
         |  SELECT source, n,
         |    CASE WHEN CAST(CAST(n AS HUGEINT) * sxx
         |        - CAST(sx AS HUGEINT) * sx AS DOUBLE) = 0.0 THEN NULL
         |      ELSE CAST(CAST(n AS HUGEINT) * sxy
         |          - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         |        / CAST(CAST(n AS HUGEINT) * sxx
         |          - CAST(sx AS HUGEINT) * sx AS DOUBLE) / 1.0e12 END AS slope,
         |    CASE WHEN CAST(CAST(pn AS HUGEINT) * psxx
         |        - CAST(psx AS HUGEINT) * psx AS DOUBLE) = 0.0 THEN NULL
         |      ELSE CAST(CAST(pn AS HUGEINT) * psxy
         |          - CAST(psx AS HUGEINT) * psy AS DOUBLE)
         |        / CAST(CAST(pn AS HUGEINT) * psxx
         |          - CAST(psx AS HUGEINT) * psx AS DOUBLE) / 1.0e12 END
         |      AS pooled_slope
         |  FROM per CROSS JOIN pool)
         |SELECT source, n, slope, pooled_slope,
         |  CASE WHEN slope IS NULL OR pooled_slope IS NULL THEN NULL
         |    ELSE slope * pooled_slope < 0 END AS sign_flip
         |FROM k ORDER BY source""".stripMargin,
    "q226_cohens_kappa" ->
      s"""WITH $LmCtes,
         |q AS (
         |  $QualitySql),
         |sc AS (
         |  SELECT d.source, (q.quality_score >= $PassThreshold) AS a,
         |    CAST(floor(lmv.avg_logp * 1.0e12) AS BIGINT) AS bq
         |  FROM documents d JOIN lmv USING (doc_id) JOIN q USING (doc_id)),
         |tot AS (
         |  SELECT sum(CAST(bq AS HUGEINT)) AS sb,
         |    CAST(count(*) AS BIGINT) AS nb
         |  FROM sc),
         |fl AS (
         |  SELECT source, a, (CAST(bq AS HUGEINT) * nb >= sb) AS b
         |  FROM sc CROSS JOIN tot),
         |ct AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM fl GROUP BY source),
         |k AS (
         |  SELECT source, n, n11, n10, n01, n00,
         |    CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |    CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
         |       + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
         |  FROM ct)
         |SELECT source, n, n11, n10, n01, n00, po, pe,
         |  CASE WHEN pe = 1.0 THEN NULL ELSE (po - pe) / (1.0 - pe) END AS kappa
         |FROM k ORDER BY source""".stripMargin,
    "q185_rank_corr" ->
      s"""WITH $LmCtes,
         |q AS (
         |  $QualitySql),
         |j AS (
         |  SELECT d.source, d.doc_id, lmv.avg_logp, q.quality_score
         |  FROM documents d JOIN lmv USING (doc_id) JOIN q USING (doc_id)),
         |r AS (
         |  SELECT source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY avg_logp, doc_id) AS BIGINT) AS rx,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY quality_score, doc_id) AS BIGINT) AS ry
         |  FROM j),
         |m AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         |    CAST(sum(rx * ry) AS BIGINT) AS sxy,
         |    CAST(sum(rx * rx) AS BIGINT) AS sxx,
         |    CAST(sum(ry * ry) AS BIGINT) AS syy
         |  FROM r GROUP BY source)
         |SELECT source, n,
         |  CASE WHEN n < 2 THEN NULL ELSE
         |    CAST(n * sxy - sx * sy AS DOUBLE) /
         |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
         |         CAST(n * syy - sy * sy AS DOUBLE)) END AS spearman
         |FROM m ORDER BY source""".stripMargin,
    "q186_wilson_ci" ->
      s"""WITH q AS (
         |  $QualitySql),
         |a AS (
         |  SELECT d.source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN q.quality_score >= $PassThreshold THEN 1 ELSE 0 END)
         |      AS BIGINT) AS k
         |  FROM documents d JOIN q USING (doc_id)
         |  GROUP BY d.source),
         |z AS (SELECT CAST($WilsonZ AS DOUBLE) AS z)
         |SELECT source, n, k,
         |  CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS pass_rate,
         |  ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + z.z * z.z / (2.0 * CAST(n AS DOUBLE)))
         |   - z.z * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
         |       * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
         |       + z.z * z.z / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |  / (1.0 + z.z * z.z / CAST(n AS DOUBLE)) AS wilson_lo,
         |  ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + z.z * z.z / (2.0 * CAST(n AS DOUBLE)))
         |   + z.z * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
         |       * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
         |       + z.z * z.z / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |  / (1.0 + z.z * z.z / CAST(n AS DOUBLE)) AS wilson_hi
         |FROM a CROSS JOIN z ORDER BY source""".stripMargin,
    "q187_label_prototypes" ->
      """WITH t AS (
        |  SELECT label, vec_id, u.i AS dim,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1.0e9) AS BIGINT) AS xq
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)),
        |s1 AS (
        |  SELECT label, dim, CAST(sum(xq) AS BIGINT) AS s1
        |  FROM t GROUP BY label, dim),
        |np AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |       FROM embeddings GROUP BY label),
        |d2 AS (
        |  SELECT t.label, t.vec_id, np.n,
        |    sum(CAST(t.xq * np.n - s1.s1 AS HUGEINT)
        |      * CAST(t.xq * np.n - s1.s1 AS HUGEINT)) AS d2
        |  FROM t JOIN s1 ON s1.label = t.label AND s1.dim = t.dim
        |  JOIN np ON np.label = t.label
        |  GROUP BY t.label, t.vec_id, np.n),
        |r AS (
        |  SELECT label, n, vec_id, d2,
        |    row_number() OVER (PARTITION BY label ORDER BY d2, vec_id) AS rk
        |  FROM d2)
        |SELECT label, n, vec_id AS proto_vec_id,
        |  sqrt(CAST(d2 AS DOUBLE)) / CAST(n AS DOUBLE) / 1.0e9 AS proto_dist
        |FROM r WHERE rk = 1 ORDER BY label""".stripMargin,
    "q188_readability" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS s,
        |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS v
        |  FROM documents),
        |f AS (
        |  SELECT source, w, s, v,
        |    CAST(0.39 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
        |    + CAST(11.8 AS DOUBLE) * (CAST(v AS DOUBLE) / CAST(w AS DOUBLE))
        |    - CAST(15.59 AS DOUBLE) AS fk
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS words,
        |  CAST(sum(s) AS BIGINT) AS sentences,
        |  CAST(sum(v) AS BIGINT) AS syllables,
        |  CAST(sum(CAST(floor(fk * 1.0e12) AS HUGEINT)) AS DOUBLE) / 1.0e12
        |    / CAST(count(*) AS DOUBLE) AS avg_fk_grade
        |FROM f GROUP BY source ORDER BY source""".stripMargin
  )
}
