package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{CacheScope, Tables}
import graft.functions.{Pin, TextFunctions}

/** Trainable corpus filters — the model-fitting layer a production
  * training-data pipeline runs on top of the heuristic curation core
  * (q30/q31): fit a multinomial Naive Bayes classifier on a labeled slice,
  * score the whole corpus with it, evaluate the fit, and importance-resample
  * toward a target distribution (the CCNet / DSIR recipe: Wenzek et al. 2020
  * "CCNet"; Xie et al. 2023 "Data Selection for Language Models via
  * Importance Resampling"). All four stages are deterministic and
  * DuckDB-oracled — no RNG, no iterative solver; NB's closed-form counts and
  * the hashed-Gumbel sampler make the entire family exact-reproducible at
  * any parallelism.
  *
  * Reference anchor: the lakehouse curates by static column predicates only
  * (reference include/src/silver_to_gold.py:40-66 keeps hazardous-asteroid
  * flags); a trained relevance filter is the corpus-scale generalization.
  *
  * SCALE SHAPE (the 100 TB story, per operator):
  *   - fit: two token-keyed aggregates (map-side partial combine, shuffle
  *     carries one row per (label, token) / (token)) + one bounded
  *     |labels| x |vocab| dense-model build. The dense model is the join
  *     side for scoring, so its size is the knob: a binary quality
  *     classifier over a 10^6-token vocab is 2x10^6 rows (~50 MB) —
  *     broadcastable; past `modelBroadcastLimit` entries the scoring join
  *     falls back to a token-keyed shuffle join (same values, spec-pinned
  *     pattern shared with Curation.lmScore).
  *   - score: ONE corpus scan (explode tokens, occurrence-compressed to
  *     distinct (doc, token) pairs with multiplicity), the model join, one
  *     (doc_id, label) partial-agg shuffle, then a |labels|-wide window per
  *     doc for the argmax. Nothing corpus-sized is ever broadcast or
  *     collected.
  *   - resample: Gumbel-top-k (Efraimidis-Spirakis weighted sampling) over
  *     per-doc importance weights plans as TakeOrderedAndProject — each
  *     partition keeps its local top k, the driver merges k-sized heaps; no
  *     global sort at any scale.
  */
object Classify {

  /** Pinned parameters: shared by the queries' defaults AND the generated
    * oracle SQL (one source of truth — the round-5 advice pattern). */
  private[operators] val TargetLang = "en"
  private[operators] val ResampleK = 100
  private[operators] val TokenBudget = 2000L
  private[operators] val PrCurvePcts: Seq[Double] = (1 to 9).map(_ / 10.0)
  // the q111 split cuts, re-derived from Datasets' pinned fractions with the
  // SAME double arithmetic (so the interpolated oracle literals are
  // bit-identical to q111's)
  private val TrainCut = 1.0 - Datasets.ValFrac - Datasets.TestFrac
  private val ValCut = 1.0 - Datasets.TestFrac
  private val Pow60 = 1152921504606846976.0 // 2^60 as double (exact)

  /** Entries above which the scoring join stops broadcasting the dense
    * model: |labels| x |vocab| rows x ~40 B ≈ 80 MB at 2M — the same
    * crossover Curation.lmScore measured for its bigram LM. */
  private val ModelBroadcastLimit = 2L * 1000 * 1000

  /** Whitespace token stream with multiplicity, keyed by doc and label —
    * the repo-standard `regexp_split_to_array(trim(text), '\s+')` twin. */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(split(trim(col("text")), "\\s+")).as("token"))

  /** Occurrence-compressed token frame: one row per distinct (doc, token)
    * with its in-doc multiplicity. Every downstream sum Σ_occurrences f(t)
    * becomes Σ_pairs n·f(t) — EXACT in decimal arithmetic — so the model
    * join and the per-doc score shuffle carry distinct pairs, not raw
    * occurrences (~2-5x less on Zipf text, more under long repetition).
    *
    * SCAN-LOCAL: the histogram is a higher-order-function expression over
    * the doc's own token array (distinct x filter-count), not an
    * explode + groupBy — a doc's tokens never leave its scan partition, so
    * the whole compression costs ZERO shuffles (measured: removed the one
    * corpus-sized exchange in the scoring path). The in-row cost is
    * O(len x distinct) per doc — right for documents (10^2-10^4 tokens);
    * for pathological million-token rows, chunk upstream (q42) first. */
  private[graft] def docTokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), col("lang"),
        explode(expr("transform(array_distinct(ws), " +
          "t -> named_struct('token', t, 'n_tok', size(filter(ws, x -> x = t))))"))
          .as("e"))
      .select(col("doc_id"), col("lang"), col("e.token").as("token"),
        col("e.n_tok").cast("long").as("n_tok"))

  /** Laplace-smoothed multinomial NB token model, DENSE over
    * |labels| x |vocab|: log_lik(c, t) = ln((n_ct + 1) / (n_c + V)).
    * Dense (zero-count pairs materialized at the smoothed floor) so the
    * scoring join is complete without a per-label OOV default path — and so
    * the DuckDB oracle is a plain join. Bounded by construction:
    * labels x vocab, never corpus-sized. */
  private def nbModel(dtok: DataFrame): DataFrame =
    nbModelFromCounts(dtok.groupBy(col("lang"), col("token"))
      .agg(sum(col("n_tok")).as("n_ct")))

  /** Dense model from aggregated (lang, token, n_ct) sufficient
    * statistics. Counts are MERGEABLE (plain integer sums), which is what
    * makes the streaming incremental fit (ClassifyStream) exact: summing
    * per-batch count partitions and fitting equals fitting the union. The
    * per-label token totals and the vocab both re-derive from the counts
    * frame, so stats are the ONLY state a pipeline must persist. */
  private[graft] def nbModelFromCounts(ct: DataFrame): DataFrame = {
    val tot = ct.groupBy(col("lang")).agg(sum(col("n_ct")).as("n_c"))
    val voc = ct.select(col("token")).distinct()
    val vcnt = voc.agg(count(lit(1)).as("v"))
    tot.crossJoin(voc).crossJoin(broadcast(vcnt))
      .join(ct, Seq("lang", "token"), "left")
      .select(col("lang").as("label"), col("token"),
        coalesce(col("n_ct"), lit(0L)).as("n_ct"),
        // ln is not correctly-rounded cross-engine: grid-pin it AT THE
        // SOURCE so every downstream consumer (scores, softmax, argmax)
        // computes from bit-identical doubles (round-11 sweep; Pin.scala)
        Pin.grid9(
          log((coalesce(col("n_ct"), lit(0L)).cast("double") + lit(1.0)) /
            (col("n_c").cast("double") + col("v").cast("double")))).as("log_lik"))
  }

  /** ln class priors from document counts. |labels| rows. */
  private def nbPriors(docs: DataFrame): DataFrame =
    nbPriorsFromCounts(docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs")))

  /** Priors from aggregated (lang, n_docs) counts — mergeable, like
    * [[nbModelFromCounts]]. */
  private[graft] def nbPriorsFromCounts(nd: DataFrame): DataFrame = {
    val nt = nd.agg(sum(col("n_docs")).as("n"))
    nd.crossJoin(broadcast(nt))
      .select(col("lang").as("label"),
        Pin.grid9(log(col("n_docs").cast("double") / col("n").cast("double")))
          .as("log_prior"))
  }

  /** Frame-level fit (spec + composition entry): the dense NB model for any
    * (doc_id, lang, text) frame. */
  private[graft] def fitModel(docs: DataFrame): DataFrame =
    nbModel(docTokenCounts(docs))

  /** Per-(doc, label) posterior scores + argmax prediction. Score sums run
    * through DECIMAL(25,15) so addition order (and therefore partitioning)
    * cannot perturb the double — the q92 cross-engine pattern. Ties break
    * to the lexicographically smallest label (explicit, both engines). */
  /** Per-(doc, label) posterior: the model join + one decimal-summed
    * partial aggregate. Σ_occurrences log_lik == Σ_pairs n_tok·log_lik,
    * exactly: decimal(25,15) x decimal(10,0) = decimal(36,15) (no precision
    * loss; n_tok < 10^10 per doc-token by corpus construction). The model
    * and priors may be fit on a DIFFERENT frame than `dtok` (holdout
    * scoring); tokens outside the model vocab drop at the inner join — the
    * standard ignore-OOV NB choice, identical in the oracle. */
  private def nbScores(model: DataFrame, priors: DataFrame,
                       dtok: DataFrame): DataFrame = {
    val modelSide =
      if (model.count() <= ModelBroadcastLimit) broadcast(model) else model
    dtok
      .join(modelSide, Seq("token"))
      .join(broadcast(priors), Seq("label"))
      .groupBy(col("doc_id"), col("label"), col("log_prior"))
      .agg((sum(col("log_lik").cast("decimal(25,15)") *
        col("n_tok").cast("decimal(10,0)")).cast("double") +
        col("log_prior")).as("score"))
      .select(col("doc_id"), col("label"), col("score"))
  }

  /** Argmax decode over [[nbScores]]: a |labels|-wide window per doc. */
  private[graft] def nbApply(model: DataFrame, priors: DataFrame,
                             dtok: DataFrame): DataFrame = {
    val rn = row_number().over(
      Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("label")))
    nbScores(model, priors, dtok).withColumn("rn", rn).filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"), col("score"))
  }

  private[graft] def nbPredictions(docs: DataFrame): DataFrame = {
    // cached: BOTH the fit aggregates and the scoring join consume it
    val dtok = CacheScope.cached(docTokenCounts(docs))
    nbApply(CacheScope.cached(nbModel(dtok)), nbPriors(docs), dtok)
  }

  /** q121 — NB fit: the (label, token) conditional log-likelihood table.
    * This IS the model artifact a pipeline persists and ships to the
    * scoring stage. */
  def q121NbTrain(s: SparkSession, dir: String): DataFrame =
    fitModel(Tables.documents(s, dir)).orderBy(col("label"), col("token"))

  /** q122 — corpus scoring: argmax-label prediction per document. */
  def q122NbClassify(s: SparkSession, dir: String): DataFrame =
    nbPredictions(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** q123 — classifier evaluation: per-label support/prediction counts and
    * precision / recall / F1 against the true label. (Training-set
    * confusion here — the standard fit sanity readout; compose with the
    * q111 split for held-out evaluation.) */
  def q123ClassifierEval(s: SparkSession, dir: String): DataFrame =
    classifierEval(Tables.documents(s, dir))

  /** Frame-level eval (spec + composition entry). */
  private[graft] def classifierEval(docs: DataFrame): DataFrame =
    evalFromPreds(nbPredictions(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))

  /** Confusion-derived per-label metrics from a (doc_id, pred_label, score,
    * lang) predictions frame. */
  private def evalFromPreds(predsIn: DataFrame): DataFrame = {
      // cached: BOTH the per-true-label and per-predicted-label aggregates
      // consume the scored predictions (harness clearCache frees it)
      val preds = CacheScope.cached(predsIn)
      val agg = preds.groupBy(col("lang")).agg(
        count(lit(1)).as("n_true"),
        sum(when(col("pred_label") === col("lang"), 1L).otherwise(0L)).as("tp"))
      val prd = preds.groupBy(col("pred_label")).agg(count(lit(1)).as("n_pred"))
      val safeDiv = (n: Column, d: Column) =>
        when(d > 0, n.cast("double") / d.cast("double")).otherwise(lit(0.0))
      agg.join(prd, col("lang") === col("pred_label"), "left")
        .select(col("lang").as("label"), col("n_true"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"), col("tp"))
        .withColumn("precision", safeDiv(col("tp"), col("n_pred")))
        .withColumn("recall", safeDiv(col("tp"), col("n_true")))
        .withColumn("f1",
          when(col("precision") + col("recall") > 0.0,
            lit(2.0) * col("precision") * col("recall") /
              (col("precision") + col("recall"))).otherwise(lit(0.0)))
        .orderBy(col("label"))
  }

  /** q124 — DSIR-style importance resampling toward the `TargetLang` slice.
    *
    * Importance weight per doc: logw = Σ_tokens [ln p_target(t) −
    * ln p_background(t)] under Laplace-smoothed unigram LMs sharing the
    * corpus vocab (target ⊆ corpus, so the background vocab covers it).
    * Sampling ∝ exp(logw) without replacement via the Gumbel-top-k /
    * Efraimidis-Spirakis reduction: key = logw − ln(−ln(u)) with
    * u = (h60(doc_id)+0.5)/2^60 ∈ (0,1) — the repo's md5-keyed uniform, so
    * the draw is a pure function of doc_id (reproducible cross-engine, at
    * any parallelism, and stable under corpus growth of OTHER docs' keys).
    * Top-k by key plans as TakeOrderedAndProject (per-partition heaps, no
    * global sort). */
  def q124ImportanceResample(s: SparkSession, dir: String): DataFrame =
    importanceResample(Tables.documents(s, dir), TargetLang, ResampleK)

  /** Frame-level resampler (spec + composition entry). */
  private[graft] def importanceResample(docs: DataFrame, target: String,
                                        k: Int): DataFrame = {
      // cached: the two LM fits and the scoring join all consume it
      val dtok = CacheScope.cached(docTokenCounts(docs))
      val tDt = dtok.filter(col("lang") === target)
      val bct = dtok.groupBy(col("token")).agg(sum(col("n_tok")).as("n_b"))
      val btot = dtok.agg(sum(col("n_tok")).as("nb"))
      val tct = tDt.groupBy(col("token")).agg(sum(col("n_tok")).as("n_t"))
      val ttot = tDt.agg(sum(col("n_tok")).as("nt"))
      val vcnt = dtok.agg(count_distinct(col("token")).as("v"))
      // per-token log-ratio: vocab-bounded, the broadcast side of scoring
      val delta = bct
        .crossJoin(broadcast(btot)).crossJoin(broadcast(ttot))
        .crossJoin(broadcast(vcnt))
        .join(tct, Seq("token"), "left")
        .select(col("token"),
          (Pin.grid9(log((coalesce(col("n_t"), lit(0L)).cast("double") + lit(1.0)) /
               (col("nt").cast("double") + col("v").cast("double")))) -
           Pin.grid9(log((col("n_b").cast("double") + lit(1.0)) /
               (col("nb").cast("double") + col("v").cast("double"))))).as("delta"))
      val w = dtok.join(broadcast(delta), Seq("token"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("delta").cast("decimal(25,15)") *
          col("n_tok").cast("decimal(10,0)")).cast("double").as("logw"))
      val u = (TextFunctions.h60(col("doc_id").cast("string")) + lit(0.5)) /
        lit(Pow60)
      w.select(col("doc_id"), col("lang"), col("logw"),
          (col("logw") - Pin.grid9(log(-Pin.grid9(log(u))))).as("samp_key"))
        .orderBy(col("samp_key").desc, col("doc_id"))
        .limit(k)
  }

  /** q125 — held-out evaluation: fit on the q111 'train' split, evaluate on
    * the 'val' split. The split is the SAME h60-uniform cut q111 emits, so
    * this composes the split operator with the classifier family without
    * materializing an intermediate. Val-set tokens missing from the train
    * vocab drop at the scoring join (ignore-OOV NB); a val doc with NO
    * in-vocab tokens would drop from the eval — the metrics cover scored
    * docs, which both engines define identically. */
  def q125HoldoutEval(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val u = TextFunctions.h60(col("doc_id").cast("string")).cast("double") /
      lit(Pow60)
    holdoutEval(docs.filter(u < lit(TrainCut)),
      docs.filter(u >= lit(TrainCut) && u < lit(ValCut)))
  }

  /** Frame-level holdout eval (spec + composition entry). */
  private[graft] def holdoutEval(train: DataFrame, eval: DataFrame): DataFrame = {
    val trainDt = CacheScope.cached(docTokenCounts(train))
    evalFromPreds(
      nbApply(CacheScope.cached(nbModel(trainDt)), nbPriors(train),
        docTokenCounts(eval))
        .join(eval.select(col("doc_id"), col("lang")), Seq("doc_id")))
  }

  /** Binary (target-vs-rest) NB log-odds per document — the quality score
    * the threshold ops consume. Labels collapse to {target, 'rest'} before
    * the fit; logodds = score(target) − score(rest), both decimal-summed
    * doubles, so the subtraction is deterministic. Precondition: the corpus
    * contains both target and non-target docs (nulls propagate identically
    * in both engines otherwise). */
  private def binaryLogOdds(docs: DataFrame, target: String): DataFrame = {
    val bin = docs.withColumn("lang",
      when(col("lang") === target, target).otherwise(lit("rest")))
    val dtok = CacheScope.cached(docTokenCounts(bin))
    nbScores(CacheScope.cached(nbModel(dtok)), nbPriors(bin), dtok)
      .groupBy(col("doc_id"))
      .agg((max(when(col("label") === target, col("score"))) -
            max(when(col("label") === "rest", col("score")))).as("logodds"))
  }

  /** q126 — precision/recall curve for the binary target-lang filter: sweep
    * the NB log-odds threshold across its own deciles (exact percentile —
    * the q39 convention; swap approx_percentile at 100 TB, documented
    * there) and report the confusion metrics at each cut. The 9-row
    * threshold frame broadcasts; the corpus side is ONE conditional-sum
    * aggregate over a 9x row multiply — no per-threshold rescans. */
  def q126PrCurve(s: SparkSession, dir: String): DataFrame =
    prCurve(Tables.documents(s, dir), TargetLang)

  /** Frame-level PR curve (spec + composition entry). */
  private[graft] def prCurve(docs: DataFrame, target: String): DataFrame = {
    // cached: consumed by the percentile aggregate AND the sweep aggregate
    val scored = CacheScope.cached(binaryLogOdds(docs, target)
      .join(docs.select(col("doc_id"), (col("lang") === target).as("is_t")),
        Seq("doc_id")))
    val pcts = PrCurvePcts.map(p => s"${p}D").mkString(", ")
    val thr = scored
      .agg(expr(s"percentile(logodds, array($pcts))").as("ts"))
      .select(posexplode(col("ts")).as(Seq("i", "threshold")))
      .select((col("i") + 1).as("pct10"), col("threshold"))
    scored.crossJoin(broadcast(thr))
      .groupBy(col("pct10"), col("threshold"))
      .agg(
        sum(when(col("logodds") >= col("threshold"), 1L).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("logodds") >= col("threshold") && col("is_t"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("pct10"), col("threshold"), col("n_pred_pos"), col("tp"),
        when(col("n_pred_pos") > 0,
          col("tp").cast("double") / col("n_pred_pos").cast("double"))
          .otherwise(lit(0.0)).as("precision"),
        when(col("n_pos") > 0,
          col("tp").cast("double") / col("n_pos").cast("double"))
          .otherwise(lit(0.0)).as("recall"))
      .orderBy(col("pct10"))
  }

  /** q127 — budget-constrained greedy selection: within each source, take
    * docs in descending target-lang log-odds order until the per-source
    * token budget fills (cum-before-doc < budget, the q86 packing
    * convention). The per-domain-quota x quality shape is how a mixture
    * spec turns into an actual shard list. Scale: windows partition by
    * source (domains at 100 TB — many and bounded); the score frame joins
    * back to a scan-local token count. A pathologically large single
    * source shatters the same way q106 documents (pre-bucket by score
    * band, then one bounded window per band). */
  def q127BudgetSelect(s: SparkSession, dir: String): DataFrame =
    budgetSelect(Tables.documents(s, dir), TargetLang, TokenBudget)

  /** Frame-level budget selector (spec + composition entry). */
  private[graft] def budgetSelect(docs: DataFrame, target: String,
                                  budget: Long): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val wnd = Window.partitionBy(col("source"))
      .orderBy(col("logodds").desc, col("doc_id"))
    base.join(binaryLogOdds(docs, target), Seq("doc_id"))
      .withColumn("cum_before",
        sum(col("n_tokens")).over(wnd) - col("n_tokens"))
      .filter(col("cum_before") < lit(budget))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("logodds"),
        col("cum_before"))
      .orderBy(col("source"), col("cum_before"))
  }

  /** q131's pinned class list — the testdata generator's stable language
    * set, shared by the engine expression AND the generated oracle SQL so
    * the two sum MI terms in the IDENTICAL left-to-right order (the
    * determinism hinge: IEEE addition is order-sensitive). */
  private[operators] val MiClasses = Seq("de", "en", "es", "fr", "zh")

  def q131FeatureMi(s: SparkSession, dir: String): DataFrame =
    featureMi(Tables.documents(s, dir))

  /** q131 — mutual information I(token-presence; class) per vocabulary
    * token: the classic filter-method feature selection for the NB family
    * (which tokens carry class signal; near-zero MI = noise dims a fitted
    * filter can drop). Binary presence × |classes| contingency per token,
    * MI = Σ_cells p(t,c)·ln(p(t,c)/(p(t)p(c))), 0·ln0 = 0.
    *
    * Scale shape: ONE corpus scan (array_distinct is scan-local, the
    * per-(token) conditional-sum aggregate shuffles one row per distinct
    * (doc, token) pair with map-side combine — the q121 fit's exact
    * shuffle), one 1-row class-sizes broadcast. Output is vocab-sized.
    * All classes ride ONE aggregate as sum(when) columns — the q107/q126
    * conditional-sum shape, not a per-class pass.
    *
    * Determinism: counts are exact longs; each MI term is a fixed dag of
    * double ops; the class fold order is pinned by [[MiClasses]] in both
    * engines. Emits ALL tokens (no top-k) ordered by token, so near-tie
    * MI values cannot reorder rows cross-engine. */
  private[graft] def featureMi(docs: DataFrame,
                               classes: Seq[String] = MiClasses): DataFrame = {
    val pres = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(trim(col("text")), "\\s+"))).as("token"))
    val dfAggs = classes.map(c =>
      sum(when(col("lang") === c, 1L).otherwise(0L)).as(s"df_$c"))
    val cnt = pres.groupBy(col("token")).agg(dfAggs.head, dfAggs.tail: _*)
    val sizeAggs = count(lit(1)).as("n") +: classes.map(c =>
      sum(when(col("lang") === c, 1L).otherwise(0L)).as(s"n_$c"))
    val sizes = docs.agg(sizeAggs.head, sizeAggs.tail: _*)
    val withTot = cnt.crossJoin(broadcast(sizes))
      .withColumn("df_t", classes.map(c => col(s"df_$c")).reduce(_ + _))
    val nD = col("n").cast("double")
    val dft = col("df_t").cast("double")
    def term(c: String): Column = {
      val dfc = col(s"df_$c").cast("double")
      val nc = col(s"n_$c").cast("double")
      val absent = col(s"n_$c") - col(s"df_$c")
      val absD = absent.cast("double")
      when(col(s"df_$c") === 0L, lit(0.0)).otherwise(
        (dfc / nD) * Pin.grid9(log((nD * dfc) / (dft * nc)))) +
      when(absent === 0L, lit(0.0)).otherwise(
        (absD / nD) * Pin.grid9(log((nD * absD) / ((nD - dft) * nc))))
    }
    withTot.select(col("token"), col("df_t"),
        classes.map(term).reduce(_ + _).as("mi"))
      .orderBy(col("token"))
  }

  /** q190 — calibration (reliability) report for the NB classifier: bin
    * the softmax confidence of each prediction into deciles and compare
    * average confidence to observed accuracy per bin — the standard
    * reliability diagram + per-bin ECE gap read before classifier scores
    * gate documents by THRESHOLD (q123/q126 rank quality; this is
    * whether the probabilities MEAN anything).
    *
    * Softmax without a float sum-order hazard: per doc, conf(pred) =
    * 1 / Σ_label exp(score − max_score) with the Σ as floor(exp·1e15)
    * decimals (≤ |labels| terms, order-free; the argmax term is exactly
    * 1e15). Scores reuse nbScores' decimal-summed chain — bit-identical
    * cross-engine, so bins match exactly. Scale shape: the q122 scoring
    * plan plus one |labels|-wide per-doc window pair and one 10-key
    * aggregate. */
  def q190Calibration(s: SparkSession, dir: String): DataFrame =
    calibrationOf(Tables.documents(s, dir))

  private[graft] def calibrationOf(docs: DataFrame): DataFrame = {
    val dtok = CacheScope.cached(docTokenCounts(docs))
    val scores = nbScores(nbModel(dtok), nbPriors(docs), dtok)
    val wd = Window.partitionBy(col("doc_id"))
    val wr = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("label"))
    val perDoc = scores
      .withColumn("mx", max(col("score")).over(wd))
      .withColumn("rn", row_number().over(wr))
      .groupBy(col("doc_id"))
      .agg(sum(floor(Pin.grid9(exp(col("score") - col("mx"))) * lit(1e15))
          .cast("decimal(38,0)")).as("s"),
        min(when(col("rn") === 1, col("label"))).as("pred_label"))
      .withColumn("conf", lit(1.0) / (col("s").cast("double") / lit(1e15)))
    val binned = perDoc
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(
        least(lit(9L), floor(col("conf") * lit(10.0)).cast("long")).as("bin"),
        col("conf"),
        when(col("pred_label") === col("lang"), 1L).otherwise(0L).as("ok"))
    val acc = col("n_correct").cast("double") / col("n").cast("double")
    val avgConf = col("cs").cast("double") / lit(1e15) / col("n").cast("double")
    binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("conf") * lit(1e15)).cast("decimal(38,0)")).as("cs"),
        sum(col("ok")).as("n_correct"))
      .select(col("bin"), col("n"), avgConf.as("avg_conf"), col("n_correct"),
        acc.as("accuracy"), abs(acc - avgConf).as("abs_gap"))
      .orderBy(col("bin"))
  }

  // ------------------------------------------------------------------ q197

  /** Pinned conformal miscoverage α = 0.1 (90 % marginal coverage
    * target). The quantile rank uses the EXACT integer form
    * ⌈0.9·(n+1)⌉ = (9·(n+1)+9) div 10 — no float rank arithmetic. */
  private[operators] val ConformalAlpha = 0.1

  /** Bucket grid for the distributed exact quantile selection: the
    * cumulative window runs over ≤ 10⁶+1 bucket rows REGARDLESS of
    * corpus size, and only the single target bucket is rank-windowed. */
  private val ConformalGrid = 1e6

  /** q197 — split-conformal prediction sets over the NB classifier
    * (Vovk et al.; Angelopoulos & Bates 2021 tutorial form): fit on the
    * q111 train split, calibrate 1−p̂(true label) on the val split, take
    * q̂ = the ⌈(1−α)(n+1)⌉-th smallest nonconformity, and report the
    * test-split prediction-set size distribution with its empirical
    * coverage — the distribution-free "can I trust the filter's
    * probabilities" report that complements q190's calibration bins.
    *
    * Exactness: softmax probabilities reuse q190's order-free decimal
    * chain (floor(exp·1e15) numerator and denominator, one double
    * division); q̂ is selected by EXACT global rank via a two-phase
    * bucket histogram — per-bucket integer counts, a cumulative window
    * over the bounded grid, then an in-bucket rank window — so no
    * corpus-sized global sort exists on the Spark side (the oracle uses
    * a plain global row_number; the SELECTED VALUE is identical).
    * Docs with zero in-vocab tokens (or a true label absent from the
    * train split) drop at the scoring join on both engines. If the rank
    * exceeds n_cal, q̂ = 1.0 (every label enters every set — the
    * standard infinite-quantile convention).
    *
    * Scale shape: one train-split fit (bounded model), one scoring join
    * over the non-train docs, two |labels|-wide per-doc windows, the
    * bounded-grid quantile, and a ≤|labels|-key final aggregate. */
  def q197Conformal(s: SparkSession, dir: String): DataFrame =
    conformalOf(Tables.documents(s, dir))

  private[graft] def conformalOf(docs: DataFrame): DataFrame = {
    val u = TextFunctions.h60(col("doc_id").cast("string")).cast("double") / lit(Pow60)
    val tagged = CacheScope.cached(docs.withColumn("u", u))
    val train = tagged.filter(col("u") < TrainCut)
    val rest = tagged.filter(col("u") >= TrainCut)
    val scores = nbScores(nbModel(docTokenCounts(train)), nbPriors(train),
      docTokenCounts(rest))
    val wd = Window.partitionBy(col("doc_id"))
    val probs = scores
      .withColumn("mx", max(col("score")).over(wd))
      .withColumn("e", floor(Pin.grid9(exp(col("score") - col("mx"))) * lit(1e15))
        .cast("decimal(38,0)"))
      .withColumn("sden", sum(col("e")).over(wd))
      .select(col("doc_id"), col("label"),
        (col("e").cast("double") / col("sden").cast("double")).as("p"))
    val joined = CacheScope.cached(
      probs.join(rest.select(col("doc_id"), col("lang"), col("u")), Seq("doc_id")))
    val calNc = joined
      .filter(col("u") < ValCut && col("label") === col("lang"))
      .select(col("doc_id"), (lit(1.0) - col("p")).as("nc"))
    // ---- exact global rank r = ceil(0.9 * (n_cal + 1)), two-phase select
    val rFrame = calNc.agg(count(lit(1)).as("n_cal"))
      .withColumn("r", expr("(9 * (n_cal + 1) + 9) DIV 10"))
    val bkt = least(lit(999999L), floor(col("nc") * lit(ConformalGrid)).cast("long"))
    val bcounts = calNc.select(bkt.as("bkt"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
    val target = bcounts
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bkt"))))
      .withColumn("cum_prev", col("cum") - col("cnt"))
      .crossJoin(broadcast(rFrame))
      .filter(col("cum_prev") < col("r") && col("r") <= col("cum"))
      .select(col("bkt"), col("cum_prev"), col("r"), col("n_cal"))
    val wb = Window.partitionBy(col("bkt")).orderBy(col("nc"), col("doc_id"))
    val qhatRow = calNc.withColumn("bkt", bkt)
      .join(broadcast(target), Seq("bkt"))
      .withColumn("rk", row_number().over(wb).cast("long"))
      .filter(col("rk") === col("r") - col("cum_prev"))
      .select(col("n_cal"), col("nc").as("qhat"))
    val qhat = rFrame.select(col("n_cal"))
      .join(qhatRow, Seq("n_cal"), "left")
      .select(col("n_cal"), coalesce(col("qhat"), lit(1.0)).as("qhat"))
    // ---- test-split prediction sets
    joined.filter(col("u") >= ValCut)
      .crossJoin(broadcast(qhat))
      .groupBy(col("doc_id"))
      .agg(sum(when(lit(1.0) - col("p") <= col("qhat"), 1L).otherwise(0L))
          .as("set_size"),
        max(when(col("label") === col("lang") &&
          lit(1.0) - col("p") <= col("qhat"), 1L).otherwise(0L)).as("covered"),
        max(col("qhat")).as("qhat"), max(col("n_cal")).as("n_cal"))
      .groupBy(col("set_size"))
      .agg(count(lit(1)).as("n_docs"), sum(col("covered")).as("n_covered"),
        max(col("qhat")).as("qhat"), max(col("n_cal")).as("n_cal"))
      .orderBy(col("set_size"))
  }

  // ---------------------------------------------- q217 feature-hash audit

  /** q217's pinned hash-space size (2^10 buckets — small enough that the
    * synthetic vocab actually collides, mirroring a production 2^18-2^22
    * space against a millions-strong vocab). */
  private[operators] val HashBuckets = 1024L

  /** q217 — hashing-trick collision audit (Weinberger et al. 2009):
    * project the token vocabulary into [[HashBuckets]] buckets via
    * h60 mod B and report what the collapse costs — how many distinct
    * terms share buckets (term collision rate) and, weighted by token
    * occurrences, how much probability mass lands in a bucket whose
    * PLURALITY term is some other term (mass collision rate — the
    * fraction of the feature signal a hashed NB/linear model actually
    * garbles; rare-term collisions are near-free, hot-term collisions
    * are not). Run before swapping q121's exact vocab for hashed
    * features at corpus scale.
    *
    * Determinism: everything is integer until two terminal divisions —
    * counts, bucket ids (h60 is the cross-engine md5 prefix; both
    * operands non-negative so % agrees), and the per-bucket plurality
    * mass (max of integer masses).
    *
    * Scale shape: one scan-local tokenize+explode, one vocab-keyed
    * count (partial+final), one bucket-keyed aggregate (≤B keys), one
    * 1-row summary. The vocab shuffle is the only corpus-driven
    * exchange — the same shape q70's TF-IDF already pays. */
  def featureHashQuality(docs: DataFrame, buckets: Long = HashBuckets): DataFrame = {
    require(buckets > 0, "bucket count must be positive")
    val terms = docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select((TextFunctions.h60(col("w")) % buckets).as("bucket"), col("n"))
    val byBucket = terms.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_terms"), sum(col("n")).as("mass"),
        max(col("n")).as("top_mass"))
    byBucket.agg(
        sum(col("n_terms")).as("n_terms"),
        count(lit(1)).as("n_buckets_used"),
        sum(col("mass")).as("total_mass"),
        sum(col("mass") - col("top_mass")).as("collided_mass"))
      .select(col("n_terms"), lit(buckets).as("n_buckets"), col("n_buckets_used"),
        ((col("n_terms") - col("n_buckets_used")).cast("double") /
          col("n_terms").cast("double")).as("term_collision_rate"),
        col("total_mass"),
        (col("collided_mass").cast("double") / col("total_mass").cast("double"))
          .as("mass_collision_rate"))
  }

  // ------------------------------------------------- q234 label noise

  /** q234's flag margin: a prediction only counts as label-noise
    * evidence when it beats the given label's posterior by > 5 nats —
    * confident disagreement, not boundary jitter. */
  private[operators] val NoiseMargin = 5.0

  /** q234 — label-noise screen (confident-learning-style, Northcutt et
    * al. 2021 simplified to a margin rule): cross-tabulate given labels
    * against NB predictions and flag documents whose predicted label
    * beats the GIVEN label's posterior by > [[NoiseMargin]] nats. The
    * output is the noise matrix a relabeling pass is prioritized by;
    * q123 reports the confusion matrix, this adds "which cells are
    * confidently wrong-labeled, not just hard".
    *
    * Exactness: both scores ride the q122 decimal-summed chain
    * (bit-identical cross-engine), so the margin comparison and the
    * integer cell counts cannot split engines.
    *
    * Scale shape: the q122 scoring plan with the doc-token frame and
    * score frame cached once (fit + pred-argmax + true-label probe all
    * consume them); the cross-tab is a ≤|labels|²-key aggregate. */
  def labelNoise(docs: DataFrame): DataFrame = {
    val dtok = CacheScope.cached(docTokenCounts(docs))
    val scores = CacheScope.cached(
      nbScores(CacheScope.cached(nbModel(dtok)), nbPriors(docs), dtok))
    val rn = row_number().over(
      Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("label")))
    val pred = scores.withColumn("rn", rn).filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        col("score").as("pred_score"))
    val truth = docs.select(col("doc_id"), col("lang"))
    val trueSc = scores
      .select(col("doc_id").as("ts_doc"), col("label").as("t_label"),
        col("score").as("true_score"))
      .join(truth, col("ts_doc") === col("doc_id") &&
        col("t_label") === col("lang"))
      .select(col("doc_id"), col("true_score"))
    val j = pred.join(truth, Seq("doc_id"))
      .join(trueSc, Seq("doc_id"))
      .select(col("lang").as("true_label"), col("pred_label"),
        (col("pred_label") =!= col("lang") &&
          col("pred_score") - col("true_score") > lit(NoiseMargin))
          .as("flagged"))
    j.groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("flag_rate",
        col("n_flagged").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("true_label"), col("pred_label"))
  }

  // ----------------------------------------------------- q245 ROC AUC

  /** q245 — exact ROC AUC of the [[TargetLang]]-vs-rest NB scorer via
    * the rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺·n⁻) — the
    * Mann-Whitney U normalized (q225's machinery pointed at a model
    * score). This is the threshold-FREE companion to q126's 9-point PR
    * sweep: no sort of the corpus, no threshold grid — average ranks
    * come from the VALUE-level frame (ties handled exactly), so the
    * number is exact at any scale.
    *
    * Exactness: logodds doubles are bit-identical (q126's chain); they
    * enter as floor(·1e12) grid values, so ranks, R⁺ and the AUC
    * numerator are exact integers with one terminal division.
    *
    * Scale shape: the q126 scoring plan + one (value) count + one
    * cumulative window on the distinct-score frame + a 1-row rollup. */
  def rocAuc(docs: DataFrame, target: String = TargetLang): DataFrame = {
    def dec(c: Column) = c.cast("decimal(19,0)")
    val scored = binaryLogOdds(docs, target)
      .join(docs.select(col("doc_id"), (col("lang") === target).as("is_t")),
        Seq("doc_id"))
      .select(floor(col("logodds") * lit(1e12)).cast("long").as("v"),
        col("is_t"))
    val byVal = scored.groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("cp"))
    val wv = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal
      .withColumn("cumb", coalesce(sum(col("cnt")).over(wv), lit(0L)))
      .select(col("cp"), col("cnt"),
        (lit(2L) * col("cumb") + col("cnt") + 1).as("r2"))
    ranked.agg(
        sum(col("cp")).as("n_pos"),
        sum(col("cnt")).as("n_all"),
        sum(dec(col("cp")) * dec(col("r2"))).as("rp2"))
      .select(col("n_pos"), (col("n_all") - col("n_pos")).as("n_neg"),
        ((col("rp2") - dec(col("n_pos")) * dec(col("n_pos") + 1)).cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            (col("n_all") - col("n_pos")).cast("double"))).as("auc"))
  }

  // ------------------------------------------------ q239 slice parity

  /** q239 — slice-parity audit of the NB classifier: per-language
    * recall broken down by SOURCE, reporting each language's worst
    * slice and the parity gap (max − min recall across sources). The
    * fairness/robustness readout model evals ship next to the global
    * confusion matrix (q123): a classifier that is 95% overall but 60%
    * on one source's documents fails exactly the slices a crawl adds
    * next month. Ties in the worst-slice argmin break by source name.
    *
    * Exactness: per-(lang, source) counts are exact integers off the
    * q122 prediction chain; recalls and the gap are terminal
    * divisions, min/max over bit-identical doubles.
    *
    * Scale shape: the q122 scoring plan + one (lang, source) aggregate
    * + one |slices|-row window/rollup. */
  def sliceParity(docs: DataFrame): DataFrame = {
    val per = nbPredictions(docs)
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_label") === col("lang"), 1L).otherwise(0L))
          .as("correct"))
      .withColumn("recall",
        col("correct").cast("double") / col("n").cast("double"))
    val w = Window.partitionBy(col("lang")).orderBy(col("recall"), col("source"))
    per.withColumn("rk", row_number().over(w))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_slices"),
        min(col("recall")).as("recall_min"),
        max(col("recall")).as("recall_max"),
        (max(col("recall")) - min(col("recall"))).as("parity_gap"),
        max(when(col("rk") === 1, col("source"))).as("worst_source"))
      .orderBy(col("lang"))
  }

  // ------------------------------------------- q242 uncertainty sample

  /** q242's labeling-queue size. */
  private[operators] val UncertainTopN = 25

  /** q242 — margin-based uncertainty sampling: the [[UncertainTopN]]
    * documents whose NB top-two posterior scores are closest — the
    * active-learning queue a labeling budget is spent on (smallest
    * margin = the model's most confusable documents; Lewis & Gale
    * 1994). Complements q234 (confidently WRONG) with the confidently
    * UNSURE.
    *
    * Exactness: both scores ride the q122 decimal-summed chain; the
    * margin is one double subtraction and the top-N sorts on it with
    * doc_id ties.
    *
    * Scale shape: the q122 scoring plan + one per-doc |labels|-row
    * window + TakeOrdered. */
  def uncertaintySample(docs: DataFrame): DataFrame = {
    val dtok = CacheScope.cached(docTokenCounts(docs))
    val scores = nbScores(CacheScope.cached(nbModel(dtok)), nbPriors(docs), dtok)
    val rk = row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("label")))
    scores.withColumn("rk", rk).filter(col("rk") <= 2)
      .groupBy(col("doc_id"))
      .agg(max(when(col("rk") === 1, col("label"))).as("pred_label"),
        max(when(col("rk") === 2, col("label"))).as("second_label"),
        (max(when(col("rk") === 1, col("score"))) -
          max(when(col("rk") === 2, col("score")))).as("margin"))
      .orderBy(col("margin"), col("doc_id"))
      .limit(UncertainTopN)
  }


  // ------------------------------------------- q251 source influence

  /** q251 — leave-one-source-out (LOSO) data attribution: for every
    * corpus source, the change in held-out NB accuracy when that
    * source's TRAINING data is removed — the "which sources actually
    * help" curation readout (the leave-one-out baseline of data
    * valuation; cf. Ghorbani & Zou, "Data Shapley", ICML 2019, and
    * Koh & Liang 2017 — LOO is the exact quantity those methods
    * approximate at group granularity). Complements q127 (which DOCS to
    * buy) and q106/q167 (how to MIX) with WHOSE data carries signal.
    *
    * Spark-first scale design — sufficient-statistic SUBTRACTION, not
    * re-training: NB stats are mergeable integer counts, so ONE corpus
    * scan builds per-(source, lang, token) counts and every held-out
    * model derives as total − held via a broadcast-held crossJoin — the
    * corpus is never replicated or re-scanned per source (at 100 TB the
    * only data-sized work is the one count shuffle; the 21 models are
    * vocab-bounded frames). The sentinel held value "__none" subtracts
    * nothing and IS the full model, so baseline and ablations ride one
    * plan. Scoring joins the FIXED test split once against all models
    * (token-keyed, model side vocab-bounded).
    *
    * Exactness: counts integer; ln grid-pinned ([[graft.functions.Pin]]);
    * scores the q122 decimal(25,15) order-free chain; argmax ties to the
    * smallest label; accuracy a single double division with a FIXED
    * denominator (unscored docs count as wrong, so ablated models cannot
    * shrink their own denominator).
    *
    * Perf decision (round 12, CLOSED): the delta-scoring rewrite (score
    * the full model once + per-source corrections) stays REJECTED. The
    * round-11 probes (PLANS.md "q251 stage probe") measured the premise
    * away: the shared vocab appears in every source-lang, so the
    * correction join carries 1.20M rows vs the current 1.26M — the win
    * would be ~4 s of stage-count overhead at sf0.1, not data volume,
    * while the rewrite re-pins every ln grid in BOTH engines
    * (pin(ln(a/b)) ≠ pin(ln a) − pin(ln b)) — bit-exactness churn across
    * 21 models for a constant-factor stage saving that vanishes on a
    * real cluster (stage floors are local-mode artifacts).
    *
    * Round-17 restructure (guide §2.4 — NOT the rejected delta-scoring:
    * every ln grid input is unchanged): the former (held, lang, token)-
    * keyed subtraction join (helds × tot ⋈ ctS — two model-grid-sized
    * shuffles) and the grid-building join tower (chl ⋈ voc ⋈ vh ⋈ nh,
    * plus a grid-wide DISTINCT for the vocabulary) are replaced by ONE
    * nested rollup of ctS to token grain — (lang, token) with a
    * per-source count map, then token with a per-lang map — from which
    * every ablated model's counts derive as scan-local map lookups under
    * a broadcast of the tiny (held, lang, nc, v) metadata. Bounded: a
    * token's nested map holds ≤ |langs|·|sources| entries (≤ 147 here),
    * never corpus-sized. nh = nt − c(held) is computed directly (equal
    * to the old left-join-then-coalesce: c ≤ nt always, and absent rows
    * subtract 0), the vocabulary membership test tot_all − src_all > 0
    * is the old "some lang has nh > 0" (nh ≥ 0 per lang), and the model
    * grid row set (held × langs with nc>0 × vocab tokens) is identical —
    * re-proved oracle-exact at sf0.001, sf0.01 and sf0.1. The per-held
    * prior rides the broadcast metadata too, so the old per-scored-row
    * (held, label) join disappears (same inner-join semantics, applied
    * while building the grid). Measured at sf0.1: 9.2 s → 5.8 s solo
    * min-of-N, SortMergeJoins 6 → 0 (plans/r17). */
  def q251SourceInfluence(s: SparkSession, dir: String): DataFrame =
    sourceInfluence(Tables.documents(s, dir))

  private[graft] def sourceInfluence(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val u = TextFunctions.h60(col("doc_id").cast("string")).cast("double") /
      lit(Pow60)
    val tagged = CacheScope.cached(docs.withColumn("u", u))
    val train = tagged.filter(col("u") < TrainCut)
    val evalDocs = tagged.filter(col("u") >= ValCut)
    // one scan: per-(source, lang, token) occurrence counts
    val occ = train.select(col("source"), col("lang"),
      explode(split(trim(col("text")), "\\s+")).as("token"))
    val ctS = occ.groupBy(col("source"), col("lang"), col("token"))
      .agg(count(lit(1)).as("n"))
    val ndS = CacheScope.cached(
      train.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("d")))
    val ndTot = ndS.groupBy(col("lang")).agg(sum(col("d")).as("dt"))
    // nested token-grain rollup: by_lang[lang] = (nt, src_n[source] = n).
    // ctS has exactly one consumer now, so it is NOT cached — the chain
    // occ → ctS → tokLang → tokRow is linear and tokRow is the cache.
    val tokLang = ctS.groupBy(col("lang"), col("token"))
      .agg(sum(col("n")).as("nt"),
        map_from_entries(collect_list(struct(col("source"), col("n"))))
          .as("src_n"))
    val tokRow = CacheScope.cached(tokLang.groupBy(col("token"))
      .agg(sum(col("nt")).as("tot_all"),
        map_from_entries(collect_list(struct(col("lang"),
          struct(col("nt").as("nt"), col("src_n").as("src_n")))))
          .as("by_lang")))
    // tiny per-held metadata frames (≤ (|sources|+1) · |langs| rows), all
    // re-derived from the cached tokRow (a map re-explode regroups the
    // same multiset ctS held, so tokCounts ≡ ctS.groupBy(source, lang)),
    // and all folded into ONE broadcast frame (heldMeta below): the
    // single broadcast job materializes the tokRow cache before the main
    // scoring stage can be submitted, so the expensive token rollup runs
    // exactly once instead of racing across broadcast subtrees.
    val tokCounts = tokRow
      .select(explode(col("by_lang")).as(Seq("lang", "e")))
      .select(col("lang"), explode(col("e.src_n")).as(Seq("source", "n")))
      .groupBy(col("source"), col("lang")).agg(sum(col("n")).as("c"))
    val helds = tokCounts.select(col("source").as("held")).distinct()
      .unionByName(spark.range(1).select(lit("__none").as("held")))
    val langTot = tokCounts.groupBy(col("lang")).agg(sum(col("c")).as("ct"))
    // per-(held, lang) token mass without the held source = Σ_t nh —
    // the old nH-derived cHL, computed from the tiny count frames
    val cHL = broadcast(helds).crossJoin(langTot)
      .join(tokCounts.withColumnRenamed("source", "held"),
        Seq("held", "lang"), "left")
      .select(col("held"), col("lang"),
        (col("ct") - coalesce(col("c"), lit(0L))).as("nc"))
      .filter(col("nc") > 0)
    // token ∈ vocab(held) ⟺ some lang keeps nh > 0 ⟺ the held source
    // does not own ALL of the token's occurrences
    def srcAll: Column = aggregate(map_values(col("by_lang")), lit(0L),
      (acc, v) => acc +
        coalesce(element_at(v.getField("src_n"), col("held")), lit(0L)))
    def inVocab: Column = col("tot_all") > srcAll
    val vH = tokRow.crossJoin(broadcast(helds))
      .filter(inVocab)
      .groupBy(col("held")).agg(count(lit(1)).as("v"))
    val dH = broadcast(helds).crossJoin(ndTot)
      .join(ndS.withColumnRenamed("source", "held"), Seq("held", "lang"), "left")
      .select(col("held"), col("lang"),
        (col("dt") - coalesce(col("d"), lit(0L))).as("dh"))
      .filter(col("dh") > 0)
    val dTotH = dH.groupBy(col("held")).agg(sum(col("dh")).as("dall"))
    val priors = dH.join(broadcast(dTotH), Seq("held"))
      .select(col("held"), col("lang"),
        Pin.grid9(log(col("dh").cast("double") / col("dall").cast("double")))
          .as("log_prior"))
    // heldMeta carries everything per-(held, lang) the grid needs — nc, v
    // AND the prior. Folding the prior in here keeps the old inner-join
    // semantics (model rows without a prior row are dropped — now before
    // the scoring join instead of after) and removes a per-scored-row
    // join downstream.
    val heldMeta = cHL.join(broadcast(vH), Seq("held"))
      .join(broadcast(priors), Seq("held", "lang"))
    // the model grid (held × langs with nc>0 × vocab tokens), generated
    // scan-locally: nh = nt − c(held), 0 where the (lang, token) cell is
    // absent — the same value the old grid's left join coalesced to
    val byLang = element_at(col("by_lang"), col("lang"))
    val nh = coalesce(byLang.getField("nt"), lit(0L)) -
      coalesce(element_at(byLang.getField("src_n"), col("held")), lit(0L))
    val model = tokRow.crossJoin(broadcast(heldMeta))
      .filter(inVocab)
      .select(col("held"), col("lang").as("label"), col("token"),
        Pin.grid9(log((nh.cast("double") + lit(1.0)) /
          (col("nc").cast("double") + col("v").cast("double")))).as("log_lik"),
        col("log_prior"))
    val evTok = docTokenCounts(evalDocs).withColumnRenamed("lang", "truth")
    // no join hint: the planner broadcasts the eval-token side here (its
    // estimate is small), and the model side rides tokRow's existing
    // token partitioning if a shuffle join is ever picked instead — both
    // shapes avoid re-shuffling the model grid
    val scores = evTok.join(model, Seq("token"))
      .groupBy(col("held"), col("doc_id"), col("label"), col("log_prior"),
        col("truth"))
      .agg((sum(col("log_lik").cast("decimal(25,15)") *
        col("n_tok").cast("decimal(10,0)")).cast("double") +
        col("log_prior")).as("score"))
    val w = Window.partitionBy(col("held"), col("doc_id"))
      .orderBy(col("score").desc, col("label"))
    val preds = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val nEval = evalDocs.agg(count(lit(1)).as("n_eval"))
    val accH = CacheScope.cached(preds.groupBy(col("held"))
      .agg(sum(when(col("label") === col("truth"), 1L).otherwise(0L))
        .as("n_correct"))
      .crossJoin(broadcast(nEval)))
    val acc = col("n_correct").cast("double") / col("n_eval").cast("double")
    val full = accH.filter(col("held") === "__none")
      .select(acc.as("acc_full"))
    val nRem = ndS.groupBy(col("source")).agg(sum(col("d")).as("n_removed_train"))
    accH.filter(col("held") =!= "__none")
      .join(nRem, col("held") === col("source"))
      .crossJoin(broadcast(full))
      .select(col("held").as("held_source"), col("n_removed_train"),
        col("n_eval"), col("n_correct"), acc.as("accuracy"), col("acc_full"),
        (col("acc_full") - acc).as("influence"))
      .orderBy(col("held_source"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q251_source_influence" -> (q251SourceInfluence _),
    "q234_label_noise" -> ((s, d) => labelNoise(Tables.documents(s, d))),
    "q239_slice_parity" -> ((s, d) => sliceParity(Tables.documents(s, d))),
    "q242_uncertainty" -> ((s, d) => uncertaintySample(Tables.documents(s, d))),
    "q245_roc_auc" -> ((s, d) => rocAuc(Tables.documents(s, d))),
    "q217_feature_hash" -> ((s, d) => featureHashQuality(Tables.documents(s, d))),
    "q197_conformal" -> (q197Conformal _),
    "q190_calibration" -> (q190Calibration _),
    "q131_feature_mi" -> (q131FeatureMi _),
    "q121_nb_train" -> (q121NbTrain _),
    "q122_nb_classify" -> (q122NbClassify _),
    "q123_classifier_eval" -> (q123ClassifierEval _),
    "q124_importance_resample" -> (q124ImportanceResample _),
    "q125_holdout_eval" -> (q125HoldoutEval _),
    "q126_pr_curve" -> (q126PrCurve _),
    "q127_budget_select" -> (q127BudgetSelect _))

  private def h60sql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** Shared CTE block for the binary target-vs-rest fit: ends in `scored`
    * (doc_id, logodds, is_t, source, n_tokens) — the q126/q127 input. */
  private def binCtes(target: String): String =
    s"""btok AS (
       |  SELECT doc_id,
       |    CASE WHEN lang = '$target' THEN '$target' ELSE 'rest' END AS lang,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
       |  FROM documents),
       |bct AS (SELECT lang, token, count(*) AS n_ct FROM btok GROUP BY 1, 2),
       |btotc AS (SELECT lang, count(*) AS n_c FROM btok GROUP BY 1),
       |bvoc AS (SELECT DISTINCT token FROM btok),
       |bvc AS (SELECT count(*) AS v FROM bvoc),
       |bmodel AS (
       |  SELECT btotc.lang AS label, bvoc.token,
       |    floor(ln((CAST(COALESCE(bct.n_ct, 0) AS DOUBLE) + 1.0) /
       |       (CAST(btotc.n_c AS DOUBLE) + CAST(bvc.v AS DOUBLE)))
       |      * 1.0e9 + 0.5) / 1.0e9 AS log_lik
       |  FROM btotc CROSS JOIN bvoc CROSS JOIN bvc
       |  LEFT JOIN bct ON bct.lang = btotc.lang AND bct.token = bvoc.token),
       |bnd AS (
       |  SELECT CASE WHEN lang = '$target' THEN '$target' ELSE 'rest' END AS lang,
       |    count(*) AS n_docs
       |  FROM documents GROUP BY 1),
       |bnt AS (SELECT count(*) AS n FROM documents),
       |bpri AS (
       |  SELECT lang AS label,
       |    floor(ln(CAST(n_docs AS DOUBLE) / CAST(bnt.n AS DOUBLE))
       |      * 1.0e9 + 0.5) / 1.0e9 AS log_prior
       |  FROM bnd CROSS JOIN bnt),
       |bsc AS (
       |  SELECT t.doc_id, m.label,
       |    CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
       |      + p.log_prior AS score
       |  FROM btok t
       |  JOIN bmodel m ON m.token = t.token
       |  JOIN bpri p ON p.label = m.label
       |  GROUP BY t.doc_id, m.label, p.log_prior),
       |lo AS (
       |  SELECT doc_id,
       |    max(CASE WHEN label = '$target' THEN score END)
       |      - max(CASE WHEN label = 'rest' THEN score END) AS logodds
       |  FROM bsc GROUP BY doc_id),
       |scored AS (
       |  SELECT lo.doc_id, lo.logodds, (d.lang = '$target') AS is_t, d.source,
       |    CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM lo JOIN documents d USING (doc_id))""".stripMargin

  /** Shared CTE prefix: token stream + NB model + priors (the q121/q122
    * fit, verbatim, so the three consumers cannot drift). */
  private val FitCtes =
    """tok AS (
      |  SELECT doc_id, lang,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |  FROM documents),
      |ct AS (SELECT lang, token, count(*) AS n_ct FROM tok GROUP BY 1, 2),
      |tot AS (SELECT lang, count(*) AS n_c FROM tok GROUP BY 1),
      |voc AS (SELECT DISTINCT token FROM tok),
      |vc AS (SELECT count(*) AS v FROM voc),
      |model AS (
      |  SELECT tot.lang AS label, voc.token,
      |    COALESCE(ct.n_ct, 0) AS n_ct,
      |    floor(ln((CAST(COALESCE(ct.n_ct, 0) AS DOUBLE) + 1.0) /
      |       (CAST(tot.n_c AS DOUBLE) + CAST(vc.v AS DOUBLE)))
      |      * 1.0e9 + 0.5) / 1.0e9 AS log_lik
      |  FROM tot CROSS JOIN voc CROSS JOIN vc
      |  LEFT JOIN ct ON ct.lang = tot.lang AND ct.token = voc.token),
      |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |nt AS (SELECT count(*) AS n FROM documents),
      |pri AS (
      |  SELECT lang AS label,
      |    floor(ln(CAST(n_docs AS DOUBLE) / CAST(nt.n AS DOUBLE))
      |      * 1.0e9 + 0.5) / 1.0e9 AS log_prior
      |  FROM nd CROSS JOIN nt),
      |preds AS (
      |  SELECT doc_id, label AS pred_label, score FROM (
      |    SELECT t.doc_id, m.label, p.log_prior,
      |      CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
      |        + p.log_prior AS score,
      |      row_number() OVER (PARTITION BY t.doc_id
      |        ORDER BY CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
      |          + p.log_prior DESC, m.label) AS rn
      |    FROM tok t
      |    JOIN model m ON m.token = t.token
      |    JOIN pri p ON p.label = m.label
      |    GROUP BY t.doc_id, m.label, p.log_prior)
      |  WHERE rn = 1)""".stripMargin

  /** q131 oracle SQL, GENERATED from [[MiClasses]] so the per-class term
    * expressions and their left-to-right sum order are character-identical
    * in structure to the engine's expression tree. */
  private def miOracle(classes: Seq[String]): String = {
    val dfCols = classes.map(c =>
      s"sum(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS df_$c").mkString(",\n    ")
    val nCols = classes.map(c =>
      s"sum(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS n_$c").mkString(",\n    ")
    val dfT = classes.map(c => s"df_$c").mkString(" + ")
    def term(c: String): String =
      s"""(CASE WHEN df_$c = 0 THEN 0.0 ELSE
         |   (CAST(df_$c AS DOUBLE) / nD) *
         |   (floor(ln((nD * CAST(df_$c AS DOUBLE)) / (CAST(df_t AS DOUBLE) * CAST(n_$c AS DOUBLE))) * 1.0e9 + 0.5) / 1.0e9) END
         | + CASE WHEN n_$c - df_$c = 0 THEN 0.0 ELSE
         |   (CAST(n_$c - df_$c AS DOUBLE) / nD) *
         |   (floor(ln((nD * CAST(n_$c - df_$c AS DOUBLE)) / ((nD - CAST(df_t AS DOUBLE)) * CAST(n_$c AS DOUBLE))) * 1.0e9 + 0.5) / 1.0e9) END)""".stripMargin
    s"""WITH pres AS (
       |  SELECT DISTINCT doc_id, lang, t.tok AS token
       |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ws
       |        FROM documents), unnest(ws) t(tok)),
       |cnt AS (
       |  SELECT token,
       |    $dfCols
       |  FROM pres GROUP BY token),
       |sizes AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    $nCols
       |  FROM documents),
       |j AS (
       |  SELECT *, $dfT AS df_t, CAST(n AS DOUBLE) AS nD
       |  FROM cnt CROSS JOIN sizes)
       |SELECT token, CAST(df_t AS BIGINT) AS df_t,
       |  ${classes.map(term).mkString("\n  + ")} AS mi
       |FROM j ORDER BY token""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q251_source_influence" -> {
      val u = s"${h60sql("CAST(doc_id AS VARCHAR)")} / 1152921504606846976.0"
      s"""WITH tr AS (SELECT * FROM documents WHERE $u < $TrainCut),
         |ev AS (SELECT * FROM documents WHERE $u >= $ValCut),
         |occ AS (
         |  SELECT source, lang,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM tr),
         |cts AS (SELECT source, lang, token, count(*) AS n
         |        FROM occ GROUP BY 1, 2, 3),
         |tot AS (SELECT lang, token, CAST(sum(n) AS BIGINT) AS nt
         |        FROM cts GROUP BY 1, 2),
         |helds AS (SELECT DISTINCT source AS held FROM cts
         |          UNION ALL SELECT '__none'),
         |nh AS (
         |  SELECT h.held, t.lang, t.token, t.nt - COALESCE(c.n, 0) AS nh
         |  FROM helds h CROSS JOIN tot t
         |  LEFT JOIN cts c ON c.source = h.held AND c.lang = t.lang
         |    AND c.token = t.token
         |  WHERE t.nt - COALESCE(c.n, 0) > 0),
         |voc AS (SELECT DISTINCT held, token FROM nh),
         |vh AS (SELECT held, CAST(count(*) AS BIGINT) AS v FROM voc GROUP BY 1),
         |chl AS (SELECT held, lang, CAST(sum(nh) AS BIGINT) AS nc
         |        FROM nh GROUP BY 1, 2),
         |model AS (
         |  SELECT chl.held, chl.lang AS label, voc.token,
         |    floor(ln((CAST(COALESCE(nh.nh, 0) AS DOUBLE) + 1.0)
         |      / (CAST(chl.nc AS DOUBLE) + CAST(vh.v AS DOUBLE)))
         |      * 1.0e9 + 0.5) / 1.0e9 AS log_lik
         |  FROM chl JOIN voc USING (held) JOIN vh USING (held)
         |  LEFT JOIN nh ON nh.held = chl.held AND nh.lang = chl.lang
         |    AND nh.token = voc.token),
         |nds AS (SELECT source, lang, count(*) AS d FROM tr GROUP BY 1, 2),
         |ndt AS (SELECT lang, CAST(sum(d) AS BIGINT) AS dt FROM nds GROUP BY 1),
         |dh AS (
         |  SELECT h.held, n.lang, n.dt - COALESCE(s.d, 0) AS dh
         |  FROM helds h CROSS JOIN ndt n
         |  LEFT JOIN nds s ON s.source = h.held AND s.lang = n.lang
         |  WHERE n.dt - COALESCE(s.d, 0) > 0),
         |dth AS (SELECT held, CAST(sum(dh) AS BIGINT) AS dall FROM dh GROUP BY 1),
         |pri AS (
         |  SELECT dh.held, dh.lang AS label,
         |    floor(ln(CAST(dh.dh AS DOUBLE) / CAST(dth.dall AS DOUBLE))
         |      * 1.0e9 + 0.5) / 1.0e9 AS log_prior
         |  FROM dh JOIN dth USING (held)),
         |evt AS (
         |  SELECT doc_id, truth, token, CAST(count(*) AS BIGINT) AS n_tok
         |  FROM (SELECT doc_id, lang AS truth,
         |          unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |        FROM ev)
         |  GROUP BY 1, 2, 3),
         |sc AS (
         |  SELECT m.held, e.doc_id, m.label, e.truth, p.log_prior,
         |    CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))
         |      * CAST(e.n_tok AS DECIMAL(10,0))) AS DOUBLE)
         |      + p.log_prior AS score
         |  FROM evt e
         |  JOIN model m ON m.token = e.token
         |  JOIN pri p ON p.held = m.held AND p.label = m.label
         |  GROUP BY 1, 2, 3, 4, 5),
         |pr AS (
         |  SELECT held, doc_id, label, truth FROM (
         |    SELECT *, row_number() OVER (PARTITION BY held, doc_id
         |      ORDER BY score DESC, label) AS rn
         |    FROM sc) WHERE rn = 1),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_eval FROM ev),
         |acc AS (
         |  SELECT held,
         |    CAST(sum(CASE WHEN label = truth THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_correct
         |  FROM pr GROUP BY 1),
         |nrem AS (SELECT source, CAST(sum(d) AS BIGINT) AS n_removed_train
         |         FROM nds GROUP BY 1),
         |fl AS (
         |  SELECT CAST(n_correct AS DOUBLE) / CAST(ne.n_eval AS DOUBLE)
         |    AS acc_full
         |  FROM acc CROSS JOIN ne WHERE held = '__none')
         |SELECT a.held AS held_source, nrem.n_removed_train, ne.n_eval,
         |  a.n_correct,
         |  CAST(a.n_correct AS DOUBLE) / CAST(ne.n_eval AS DOUBLE) AS accuracy,
         |  fl.acc_full,
         |  fl.acc_full - CAST(a.n_correct AS DOUBLE) / CAST(ne.n_eval AS DOUBLE)
         |    AS influence
         |FROM acc a
         |JOIN nrem ON nrem.source = a.held
         |CROSS JOIN ne CROSS JOIN fl
         |WHERE a.held <> '__none'
         |ORDER BY held_source""".stripMargin
    },

    "q217_feature_hash" ->
      s"""WITH t AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
         |        FROM documents)
         |  GROUP BY w),
         |b AS (
         |  SELECT ${h60sql("w")} % $HashBuckets AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum(n) AS BIGINT) AS mass,
         |    CAST(max(n) AS BIGINT) AS top_mass
         |  FROM t GROUP BY 1)
         |SELECT CAST(sum(n_terms) AS BIGINT) AS n_terms,
         |  CAST($HashBuckets AS BIGINT) AS n_buckets,
         |  CAST(count(*) AS BIGINT) AS n_buckets_used,
         |  CAST(sum(n_terms) - count(*) AS DOUBLE)
         |    / CAST(sum(n_terms) AS DOUBLE) AS term_collision_rate,
         |  CAST(sum(mass) AS BIGINT) AS total_mass,
         |  CAST(sum(mass - top_mass) AS DOUBLE)
         |    / CAST(sum(mass) AS DOUBLE) AS mass_collision_rate
         |FROM b""".stripMargin,
    "q131_feature_mi" -> miOracle(MiClasses),
    // train-split NB fit + q190's decimal softmax + a plain global
    // row_number for the conformal rank (the engine's two-phase bucket
    // selection picks the IDENTICAL (nc, doc_id) row)
    "q197_conformal" ->
      s"""WITH tg AS (
         |  SELECT doc_id, lang, source, text,
         |    ${h60sql("CAST(doc_id AS VARCHAR)")} / 1152921504606846976.0 AS u
         |  FROM documents),
         |ttok AS (
         |  SELECT doc_id, lang,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM tg WHERE u < $TrainCut),
         |tct AS (SELECT lang, token, count(*) AS n_ct FROM ttok GROUP BY 1, 2),
         |ttot AS (SELECT lang, count(*) AS n_c FROM ttok GROUP BY 1),
         |tvoc AS (SELECT DISTINCT token FROM ttok),
         |tvc AS (SELECT count(*) AS v FROM tvoc),
         |tmodel AS (
         |  SELECT ttot.lang AS label, tvoc.token,
         |    floor(ln((CAST(COALESCE(tct.n_ct, 0) AS DOUBLE) + 1.0) /
         |       (CAST(ttot.n_c AS DOUBLE) + CAST(tvc.v AS DOUBLE)))
         |      * 1.0e9 + 0.5) / 1.0e9 AS log_lik
         |  FROM ttot CROSS JOIN tvoc CROSS JOIN tvc
         |  LEFT JOIN tct ON tct.lang = ttot.lang AND tct.token = tvoc.token),
         |tnd AS (SELECT lang, count(*) AS n_docs FROM tg WHERE u < $TrainCut GROUP BY 1),
         |tnt AS (SELECT count(*) AS n FROM tg WHERE u < $TrainCut),
         |tpri AS (
         |  SELECT lang AS label,
         |    floor(ln(CAST(n_docs AS DOUBLE) / CAST(tnt.n AS DOUBLE))
         |      * 1.0e9 + 0.5) / 1.0e9 AS log_prior
         |  FROM tnd CROSS JOIN tnt),
         |rtok AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM tg WHERE u >= $TrainCut),
         |sc AS (
         |  SELECT t.doc_id, m.label,
         |    CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
         |      + p.log_prior AS score
         |  FROM rtok t
         |  JOIN tmodel m ON m.token = t.token
         |  JOIN tpri p ON p.label = m.label
         |  GROUP BY t.doc_id, m.label, p.log_prior),
         |pe AS (
         |  SELECT doc_id, label,
         |    CAST(floor(
         |      floor(exp(score - max(score) OVER (PARTITION BY doc_id))
         |        * 1.0e9 + 0.5) / 1.0e9
         |      * 1.0e15) AS HUGEINT) AS e
         |  FROM sc),
         |pp AS (
         |  SELECT doc_id, label,
         |    CAST(e AS DOUBLE) /
         |      CAST(sum(e) OVER (PARTITION BY doc_id) AS DOUBLE) AS p
         |  FROM pe),
         |j AS (
         |  SELECT pp.doc_id, pp.label, pp.p, tg.lang, tg.u
         |  FROM pp JOIN tg USING (doc_id)),
         |cal AS (
         |  SELECT doc_id, 1.0 - p AS nc
         |  FROM j WHERE u < $ValCut AND label = lang),
         |ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
         |rr AS (SELECT n_cal, (9 * (n_cal + 1) + 9) // 10 AS r FROM ncal),
         |rk AS (
         |  SELECT nc, CAST(row_number() OVER (ORDER BY nc, doc_id) AS BIGINT) AS rk
         |  FROM cal),
         |qh AS (
         |  SELECT rr.n_cal, COALESCE(rk.nc, 1.0) AS qhat
         |  FROM rr LEFT JOIN rk ON rk.rk = rr.r),
         |pd AS (
         |  SELECT t.doc_id,
         |    CAST(sum(CASE WHEN 1.0 - t.p <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
         |      AS set_size,
         |    max(CASE WHEN t.label = t.lang AND 1.0 - t.p <= q.qhat
         |      THEN 1 ELSE 0 END) AS covered,
         |    max(q.qhat) AS qhat, max(q.n_cal) AS n_cal
         |  FROM j t CROSS JOIN qh q
         |  WHERE t.u >= $ValCut
         |  GROUP BY t.doc_id)
         |SELECT set_size, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(covered) AS BIGINT) AS n_covered,
         |  max(qhat) AS qhat, CAST(max(n_cal) AS BIGINT) AS n_cal
         |FROM pd GROUP BY set_size ORDER BY set_size""".stripMargin,
    // FitCtes scores + softmax-by-decimal-sum + decile reliability bins
    "q190_calibration" ->
      s"""WITH $FitCtes,
         |sc AS (
         |  SELECT t.doc_id, m.label,
         |    CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
         |      + p.log_prior AS score
         |  FROM tok t
         |  JOIN model m ON m.token = t.token
         |  JOIN pri p ON p.label = m.label
         |  GROUP BY t.doc_id, m.label, p.log_prior),
         |wm AS (
         |  SELECT doc_id, label, score,
         |    max(score) OVER (PARTITION BY doc_id) AS mx,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, label) AS rn
         |  FROM sc),
         |pc AS (
         |  SELECT doc_id,
         |    sum(CAST(floor(
         |      floor(exp(score - mx) * 1.0e9 + 0.5) / 1.0e9
         |      * 1.0e15) AS HUGEINT)) AS s,
         |    min(CASE WHEN rn = 1 THEN label END) AS pred_label
         |  FROM wm GROUP BY doc_id),
         |cj AS (
         |  SELECT pc.doc_id, pc.pred_label, d.lang,
         |    1.0 / (CAST(pc.s AS DOUBLE) / 1.0e15) AS conf
         |  FROM pc JOIN documents d USING (doc_id)),
         |b AS (
         |  SELECT least(CAST(9 AS BIGINT), CAST(floor(conf * 10.0) AS BIGINT))
         |      AS bin,
         |    conf, CASE WHEN pred_label = lang THEN 1 ELSE 0 END AS ok
         |  FROM cj)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(floor(conf * 1.0e15) AS HUGEINT)) AS DOUBLE) / 1.0e15
         |    / CAST(count(*) AS DOUBLE) AS avg_conf,
         |  CAST(sum(ok) AS BIGINT) AS n_correct,
         |  CAST(sum(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy,
         |  abs(CAST(sum(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    - CAST(sum(CAST(floor(conf * 1.0e15) AS HUGEINT)) AS DOUBLE) / 1.0e15
         |      / CAST(count(*) AS DOUBLE)) AS abs_gap
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q245_roc_auc" ->
      s"""WITH ${binCtes(TargetLang)},
         |sv AS (
         |  SELECT CAST(floor(logodds * 1.0e12) AS BIGINT) AS v, is_t
         |  FROM scored),
         |bv AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS cp
         |  FROM sv GROUP BY v),
         |rk AS (
         |  SELECT cp, cnt,
         |    2 * COALESCE(sum(cnt) OVER (ORDER BY v
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      + cnt + 1 AS r2
         |  FROM bv),
         |ag AS (
         |  SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
         |    CAST(sum(cnt) AS BIGINT) AS n_all,
         |    sum(CAST(cp AS HUGEINT) * r2) AS rp2
         |  FROM rk)
         |SELECT n_pos, n_all - n_pos AS n_neg,
         |  CAST(rp2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
         |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_all - n_pos AS DOUBLE))
         |    AS auc
         |FROM ag""".stripMargin,
    "q242_uncertainty" ->
      s"""WITH $FitCtes,
         |sc AS (
         |  SELECT t.doc_id, m.label, p.log_prior,
         |    CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
         |      + p.log_prior AS score
         |  FROM tok t
         |  JOIN model m ON m.token = t.token
         |  JOIN pri p ON p.label = m.label
         |  GROUP BY t.doc_id, m.label, p.log_prior),
         |rk AS (
         |  SELECT doc_id, label, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, label) AS rk
         |  FROM sc)
         |SELECT doc_id,
         |  max(CASE WHEN rk = 1 THEN label END) AS pred_label,
         |  max(CASE WHEN rk = 2 THEN label END) AS second_label,
         |  max(CASE WHEN rk = 1 THEN score END)
         |    - max(CASE WHEN rk = 2 THEN score END) AS margin
         |FROM rk WHERE rk <= 2
         |GROUP BY doc_id ORDER BY margin, doc_id LIMIT $UncertainTopN""".stripMargin,
    "q239_slice_parity" ->
      s"""WITH $FitCtes,
         |j AS (
         |  SELECT d.lang, d.source,
         |    CASE WHEN p.pred_label = d.lang THEN 1 ELSE 0 END AS ok
         |  FROM documents d JOIN preds p USING (doc_id)),
         |per AS (
         |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(ok) AS BIGINT) AS correct,
         |    CAST(sum(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         |  FROM j GROUP BY lang, source),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY recall, source) AS rk
         |  FROM per)
         |SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_slices,
         |  min(recall) AS recall_min, max(recall) AS recall_max,
         |  max(recall) - min(recall) AS parity_gap,
         |  max(CASE WHEN rk = 1 THEN source END) AS worst_source
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "q234_label_noise" ->
      s"""WITH $FitCtes,
         |sc AS (
         |  SELECT t.doc_id, m.label, p.log_prior,
         |    CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
         |      + p.log_prior AS score
         |  FROM tok t
         |  JOIN model m ON m.token = t.token
         |  JOIN pri p ON p.label = m.label
         |  GROUP BY t.doc_id, m.label, p.log_prior),
         |tr AS (
         |  SELECT sc.doc_id, sc.score AS true_score
         |  FROM sc JOIN documents d ON d.doc_id = sc.doc_id
         |    AND sc.label = d.lang),
         |j AS (
         |  SELECT d.lang AS true_label, p.pred_label,
         |    (p.pred_label <> d.lang
         |      AND p.score - tr.true_score > $NoiseMargin) AS flagged
         |  FROM documents d
         |  JOIN preds p USING (doc_id)
         |  JOIN tr ON tr.doc_id = d.doc_id)
         |SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS flag_rate
         |FROM j GROUP BY true_label, pred_label
         |ORDER BY true_label, pred_label""".stripMargin,
    "q121_nb_train" ->
      s"""WITH $FitCtes
         |SELECT label, token, CAST(n_ct AS BIGINT) AS n_ct, log_lik
         |FROM model ORDER BY label, token""".stripMargin,
    "q122_nb_classify" ->
      s"""WITH $FitCtes
         |SELECT doc_id, pred_label, score FROM preds ORDER BY doc_id""".stripMargin,
    "q123_classifier_eval" ->
      s"""WITH $FitCtes,
         |p AS (
         |  SELECT preds.doc_id, preds.pred_label, d.lang
         |  FROM preds JOIN documents d USING (doc_id)),
         |agg AS (
         |  SELECT lang, count(*) AS n_true,
         |    sum(CASE WHEN pred_label = lang THEN 1 ELSE 0 END) AS tp
         |  FROM p GROUP BY 1),
         |prd AS (SELECT pred_label, count(*) AS n_pred FROM p GROUP BY 1),
         |m AS (
         |  SELECT agg.lang AS label, agg.n_true,
         |    COALESCE(prd.n_pred, 0) AS n_pred, agg.tp,
         |    CASE WHEN COALESCE(prd.n_pred, 0) > 0
         |      THEN CAST(agg.tp AS DOUBLE) / CAST(prd.n_pred AS DOUBLE)
         |      ELSE 0.0 END AS precision,
         |    CASE WHEN agg.n_true > 0
         |      THEN CAST(agg.tp AS DOUBLE) / CAST(agg.n_true AS DOUBLE)
         |      ELSE 0.0 END AS recall
         |  FROM agg LEFT JOIN prd ON prd.pred_label = agg.lang)
         |SELECT label, CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
         |  precision, recall,
         |  CASE WHEN precision + recall > 0.0
         |    THEN 2.0 * precision * recall / (precision + recall)
         |    ELSE 0.0 END AS f1
         |FROM m ORDER BY label""".stripMargin,
    "q124_importance_resample" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM documents),
         |bct AS (SELECT token, count(*) AS n_b FROM tok GROUP BY 1),
         |btot AS (SELECT count(*) AS nb FROM tok),
         |tct AS (
         |  SELECT token, count(*) AS n_t FROM tok
         |  WHERE lang = '$TargetLang' GROUP BY 1),
         |ttot AS (SELECT count(*) AS nt FROM tok WHERE lang = '$TargetLang'),
         |vc AS (SELECT count(DISTINCT token) AS v FROM tok),
         |delta AS (
         |  SELECT b.token,
         |    floor(ln((CAST(COALESCE(t.n_t, 0) AS DOUBLE) + 1.0) /
         |       (CAST(ttot.nt AS DOUBLE) + CAST(vc.v AS DOUBLE)))
         |      * 1.0e9 + 0.5) / 1.0e9
         |    - floor(ln((CAST(b.n_b AS DOUBLE) + 1.0) /
         |         (CAST(btot.nb AS DOUBLE) + CAST(vc.v AS DOUBLE)))
         |      * 1.0e9 + 0.5) / 1.0e9 AS delta
         |  FROM bct b CROSS JOIN btot CROSS JOIN ttot CROSS JOIN vc
         |  LEFT JOIN tct t ON t.token = b.token),
         |w AS (
         |  SELECT tok.doc_id, tok.lang,
         |    CAST(sum(CAST(d.delta AS DECIMAL(25,15))) AS DOUBLE) AS logw
         |  FROM tok JOIN delta d ON d.token = tok.token
         |  GROUP BY tok.doc_id, tok.lang)
         |SELECT doc_id, lang, logw,
         |  logw - floor(ln(-(
         |    floor(ln((${h60sql("CAST(doc_id AS VARCHAR)")} + 0.5)
         |      / 1152921504606846976.0) * 1.0e9 + 0.5) / 1.0e9))
         |    * 1.0e9 + 0.5) / 1.0e9 AS samp_key
         |FROM w
         |ORDER BY samp_key DESC, doc_id LIMIT $ResampleK""".stripMargin,
    "q125_holdout_eval" -> {
      val u = s"${h60sql("CAST(doc_id AS VARCHAR)")} / 1152921504606846976.0"
      s"""WITH tdocs AS (
         |  SELECT * FROM documents WHERE $u < $TrainCut),
         |vdocs AS (
         |  SELECT * FROM documents WHERE $u >= $TrainCut AND $u < $ValCut),
         |ttok AS (
         |  SELECT doc_id, lang,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM tdocs),
         |tc AS (SELECT lang, token, count(*) AS n_ct FROM ttok GROUP BY 1, 2),
         |tt AS (SELECT lang, count(*) AS n_c FROM ttok GROUP BY 1),
         |tvoc AS (SELECT DISTINCT token FROM ttok),
         |tvc AS (SELECT count(*) AS v FROM tvoc),
         |tmodel AS (
         |  SELECT tt.lang AS label, tvoc.token,
         |    floor(ln((CAST(COALESCE(tc.n_ct, 0) AS DOUBLE) + 1.0) /
         |       (CAST(tt.n_c AS DOUBLE) + CAST(tvc.v AS DOUBLE)))
         |      * 1.0e9 + 0.5) / 1.0e9 AS log_lik
         |  FROM tt CROSS JOIN tvoc CROSS JOIN tvc
         |  LEFT JOIN tc ON tc.lang = tt.lang AND tc.token = tvoc.token),
         |tnd AS (SELECT lang, count(*) AS n_docs FROM tdocs GROUP BY 1),
         |tnt AS (SELECT count(*) AS n FROM tdocs),
         |tpri AS (
         |  SELECT lang AS label,
         |    floor(ln(CAST(n_docs AS DOUBLE) / CAST(tnt.n AS DOUBLE))
         |      * 1.0e9 + 0.5) / 1.0e9 AS log_prior
         |  FROM tnd CROSS JOIN tnt),
         |vtok AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM vdocs),
         |preds AS (
         |  SELECT doc_id, label AS pred_label FROM (
         |    SELECT t.doc_id, m.label, p.log_prior,
         |      row_number() OVER (PARTITION BY t.doc_id
         |        ORDER BY CAST(sum(CAST(m.log_lik AS DECIMAL(25,15))) AS DOUBLE)
         |          + p.log_prior DESC, m.label) AS rn
         |    FROM vtok t
         |    JOIN tmodel m ON m.token = t.token
         |    JOIN tpri p ON p.label = m.label
         |    GROUP BY t.doc_id, m.label, p.log_prior)
         |  WHERE rn = 1),
         |p AS (
         |  SELECT preds.doc_id, preds.pred_label, d.lang
         |  FROM preds JOIN vdocs d USING (doc_id)),
         |agg AS (
         |  SELECT lang, count(*) AS n_true,
         |    sum(CASE WHEN pred_label = lang THEN 1 ELSE 0 END) AS tp
         |  FROM p GROUP BY 1),
         |prd AS (SELECT pred_label, count(*) AS n_pred FROM p GROUP BY 1),
         |met AS (
         |  SELECT agg.lang AS label, agg.n_true,
         |    COALESCE(prd.n_pred, 0) AS n_pred, agg.tp,
         |    CASE WHEN COALESCE(prd.n_pred, 0) > 0
         |      THEN CAST(agg.tp AS DOUBLE) / CAST(prd.n_pred AS DOUBLE)
         |      ELSE 0.0 END AS precision,
         |    CASE WHEN agg.n_true > 0
         |      THEN CAST(agg.tp AS DOUBLE) / CAST(agg.n_true AS DOUBLE)
         |      ELSE 0.0 END AS recall
         |  FROM agg LEFT JOIN prd ON prd.pred_label = agg.lang)
         |SELECT label, CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
         |  precision, recall,
         |  CASE WHEN precision + recall > 0.0
         |    THEN 2.0 * precision * recall / (precision + recall)
         |    ELSE 0.0 END AS f1
         |FROM met ORDER BY label""".stripMargin
    },
    "q126_pr_curve" -> {
      val th = PrCurvePcts.zipWithIndex.map { case (p, i) =>
        s"SELECT ${i + 1} AS pct10, quantile_cont(logodds, $p) AS threshold FROM scored"
      }.mkString("\n  UNION ALL ")
      s"""WITH ${binCtes(TargetLang)},
         |th AS (
         |  $th),
         |agg AS (
         |  SELECT th.pct10, th.threshold,
         |    sum(CASE WHEN s.logodds >= th.threshold THEN 1 ELSE 0 END)
         |      AS n_pred_pos,
         |    sum(CASE WHEN s.logodds >= th.threshold AND s.is_t
         |      THEN 1 ELSE 0 END) AS tp,
         |    sum(CASE WHEN s.is_t THEN 1 ELSE 0 END) AS n_pos
         |  FROM scored s CROSS JOIN th GROUP BY 1, 2)
         |SELECT pct10, threshold,
         |  CAST(n_pred_pos AS BIGINT) AS n_pred_pos, CAST(tp AS BIGINT) AS tp,
         |  CASE WHEN n_pred_pos > 0
         |    THEN CAST(tp AS DOUBLE) / CAST(n_pred_pos AS DOUBLE)
         |    ELSE 0.0 END AS precision,
         |  CASE WHEN n_pos > 0
         |    THEN CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE)
         |    ELSE 0.0 END AS recall
         |FROM agg ORDER BY pct10""".stripMargin
    },
    "q127_budget_select" ->
      s"""WITH ${binCtes(TargetLang)},
         |r AS (
         |  SELECT doc_id, source, n_tokens, logodds,
         |    CAST(sum(n_tokens) OVER (
         |      PARTITION BY source ORDER BY logodds DESC, doc_id)
         |      - n_tokens AS BIGINT) AS cum_before
         |  FROM scored)
         |SELECT doc_id, source, n_tokens, logodds, cum_before
         |FROM r WHERE cum_before < $TokenBudget
         |ORDER BY source, cum_before""".stripMargin)
}
