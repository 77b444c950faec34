package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.GraftSession

/** Plan-shape regression tests: the perf-by-construction properties the
  * engine claims (pushdown, broadcast dims, partial aggregation) must be
  * visible in the physical plan, not just hoped for. String-level checks on
  * explain output — cheap, and they fail loudly if a refactor silently
  * de-optimizes a plan (e.g. a UDF blocking pushdown). */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("plan-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q02: filters and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("GreaterThan(l_quantity,45.0)"))
    // read schema carries only the 4 projected + filter columns
    assert(!p.contains("l_returnflag"), "scan should not read unused columns")
  }

  test("q03: dims join via broadcast, no shuffle on the dim sides") {
    val p = plan("q03_top_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"))
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    // (codegen spans are only annotated in the finalized AQE plan, so the
    // shape check stops at the partial/final aggregate pair)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial and final HashAggregate")
  }

  test("q11: star fact build broadcasts every dim") {
    val p = plan("q11_star_fact")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "all three dims should broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q25: cosine expression stays inside whole-stage codegen") {
    val p = plan("q25_ann_brute")
    assert(p.toLowerCase.contains("cosine"))
    assert(p.contains("BroadcastNestedLoopJoin"), "query set should broadcast")
  }

  test("q70/q81: bounded ranks plan as partial+final WindowGroupLimit") {
    for (q <- Seq("q70_tfidf", "q81_group_sample")) {
      val p = plan(q)
      assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
        s"$q: top-k should prune per-partition BEFORE the window shuffle")
    }
  }

  test("q77: histogram aggregates scan-locally (partial+final, pruned scan)") {
    val p = plan("q77_histogram")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    // pruning: nothing beyond the priced column and (on a single-row-group
    // layout where the parallelism guard fires) its l_orderkey spread key
    for (c <- Seq("l_partkey", "l_shipdate", "l_quantity", "l_returnflag"))
      assert(!p.contains(c), s"scan must not read $c")
  }

  test("q69: removed-id set and cluster sizes broadcast against the corpus scan") {
    val p = plan("q69_dedup_canonical")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q78: exact-moment correlation is ONE aggregate pass (no Expand)") {
    val p = plan("q78_corr_exact")
    assert(!p.contains("Expand"), "six moments must share one scan, not expand")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q90: binned range join is a hash join, never a nested loop") {
    val p = plan("q90_range_join_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval binning must equi-ize the range join")
    assert(p.contains("Join"), "the equi-join on (user_id, bin) must survive")
  }

  test("q71/q79/q83: TPC-H-shape star joins broadcast every dim (one fact shuffle)") {
    for (q <- Seq("q71_volume_shipping", "q79_market_share", "q83_product_profit")) {
      val p = plan(q)
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
        s"$q: supplier/customer/part/nation are bounded dims and must broadcast")
      assert(!p.contains("SortMergeJoin"),
        s"$q: only lineitem⋈orders may shuffle; no dim may sort-merge")
    }
  }

  test("q84: priority filter stays in the outer join's ON side") {
    val p = plan("q84_order_dist")
    // the anti-priority predicate must prune orders BEFORE the join (scan
    // pushdown), never filter the join output (which would drop customers
    // with zero surviving orders)
    // look for the column inside a PushedFilters line rather than matching
    // Catalyst's Filter toString verbatim (its rendering changes across
    // Spark versions; the pushdown itself is the invariant)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    // the NEGATED equality itself must be in the pushed set — the
    // auto-generated IsNotNull(o_orderpriority) alone doesn't prove the
    // predicate left the join output (regex tolerant of value rendering)
    assert("Not\\(EqualTo\\(o_orderpriority".r.findFirstIn(pushed).isDefined,
      s"anti-priority predicate should push into the orders scan; pushed: $pushed")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q80/q92: bigram assembly is scan-local (no window, no pre-agg exchange)") {
    // WordNgramList replaced the posexplode + lead() window; a Window node
    // reappearing means bigram pairing pays a doc_id shuffle + sort again
    for (q <- Seq("q80_bigrams", "q92_lm_score")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q must not window to build bigrams")
      assert(p.toLowerCase.contains("ngram"),
        s"$q should assemble bigrams via the native WordNgramList expression")
    }
  }

  test("whole-surface plan hygiene: no cartesian products, BNLJ only where designed") {
    // BroadcastNestedLoopJoin is legitimate ONLY where a side is bounded by
    // construction: ANN/all-pairs theta joins over a broadcast query set,
    // and single-row / stats-table cross joins. Everything else must plan
    // as a hash or sort-merge join; a CartesianProduct anywhere is a bug.
    val bnljByDesign = Set(
      "q24_embed_neardup", "q25_ann_brute", "q29_ann_ivf", "q72_ann_rerank",
      "q85_knn_classify", "q108_ann_pq", "q117_hard_triplets", // query set broadcast
      "q102_kmeans_assign", "q103_semantic_dedup", "q104_ann_ivf_trained", // k-row centroid broadcast
      "q46_profile", "q67_bm25", "q70_tfidf", "q89_mixture_sample", // 1-row/stats cross joins
      "q106_temperature_mix", // 1-row denominator cross join
      "q107_vocab_growth", // 1-row bounds attach (conditional-sum checkpoints)
      "q115_embedding_gram", // 1-row moment aggregate crossed with d^2 index frame
      "q120_label_moments", // |labels|-row aggregate crossed with d-row index frame
      "q121_nb_train", "q122_nb_classify", "q123_classifier_eval", // labels x vocab dense-model build (1-row vocab-count / |labels|-row totals attaches)
      "q124_importance_resample", // 1-row LM-total attaches on the vocab-bounded delta frame
      "q125_holdout_eval", // dense-model build on the train split
      "q126_pr_curve", // 9-row threshold frame crossed with the scored corpus
      "q127_budget_select", // dense-model build (binary fit)
      "q129_cms_heavy", // 1-row sketch crossed with the top-k probe frame
      "q131_feature_mi", // 1-row class-sizes attach on the vocab frame
      "q134_triangles", // 1-row total-count attach on the per-node frame
      "q138_burst_detect", // 1-row moment attach on the per-minute frame
      "q139_kmv_overlap", // |sources|-bounded sketch-pair theta join
      "q144_pps_sample", // 1-row corpus-total attach on the scan
      "q327_token_entropy", // 1-row corpus-mean attach on the per-doc frame
      "q146_hits", // 1-row max-authority attach for the final normalization
      "q148_pmi", // 1-row unigram/bigram-total attaches
      "q150_quantile_norm", // 1-row N + score-cardinality-bounded [lo,hi] range join
      "q152_embedding_whiten", // 1-row corpus-count attach on the 64-dim moment frame
      "q156_modularity", // three 1-row component frames crossed into the final row
      "q158_kl_divergence", // 1-row corpus-total attach on the vocab-bounded term frame
      "q159_coverage_curve", // 1-row totals attach on the |checkpoints|-row frame
      "q161_lang_quota", // 1-row total + 1-row leftover attaches on the |cells|-bounded frame
      "q167_unimax_alloc", // 1-row count + 1-row saturation-aggregate attaches on the |sources|-bounded frame
      "q170_ks_drift", // |sources| x |distinct lengths| ECDF grid build (both sides bounded by construction) + 1-row total attach
      "q173_k_anonymity", // |classes|-bounded frame crossed with the 5-row k-threshold literal
      "q176_temp_mixture", // 1-row totals + 1-row leftover attaches on the |sources|-bounded frame
      "q179_ann_recall", // q25's broadcast-query theta join inside the recall composition
      "q180_class_weights", // 1-row weight-normalizer attach on the |labels|-bounded frame
      "q184_decay_activity", // 1-row max-timestamp anchor attach on the scan
      "q190_calibration", // dense-model build (q122's plan) inside the scoring side
      "q193_seq_patterns", // 1-row session-total attach on the |types|^2-bounded pattern frame
      "q194_welch_t", // 1-row corpus-moment attach on the |sources|-bounded frame
      "q195_chi2_indep", // R×C marginal grid build (category-bounded) + 1-row total attach
      "q197_conformal", // dense-model build (train-split fit) + 1-row qhat/rank attaches
      "q198_benford", // 1-row total attach on the 9-row digit grid
      "q199_km_survival", // 1-row global-max + user-count attaches on the horizon-bounded frame
      "q201_acf", // 1-row totals + 7-row lag-grid attaches on the day-grid frame
      "q202_lsh_quality", // 1-row count-frame attaches (metrics row assembly)
      "q203_ann_ndcg", // q25/q29's broadcast-query theta joins inside the composition
      "q204_neg_sample", // 1-row weight-total + |slots|-row grid attaches; the CDF probe itself is the bucketized equi-join
      "q205_shuffle_quality", // 1-row global-entropy attach on the shard frame
      "q207_mmr_diversify", // q25's broadcast-query theta join feeding the shortlist
      "q208_psi", // bucket-grid + 1-row totals attaches on the |sources| x |buckets| frame
      "q209_hill_tail", // 1-row reference-order-statistic attach on the k+1-row frame
      "q210_top_pc", // 1-row norm/lambda/trace attaches on the d-row loading frame
      "q215_matryoshka_recall", // q25's broadcast-query theta joins, one per prefix width
      "q219_blocking_quality", // two 1-row metric-frame attaches on the 1-row truth frame
      "q218_kneser_ney", // 1-row bigram-type-total attach on the top-N frame
      "q212_neyman_alloc", // 1-row weight-denominator attach on the |sources|-bounded frame
      "q214_emd_drift", // bucket-grid + 1-row corpus-total attaches (q208's shape)
      "q223_changepoint", // 1-row totals + 1-row level-1-cut attaches on the calendar-bounded day grid
      "q224_theil_sen", // day-grid self theta join (calendar-bounded) + 1-row median/total attaches
      "q225_mann_whitney", // 1-row tie-term/total attach on the |sources|-bounded frame
      "q226_cohens_kappa", // 1-row corpus-LM-threshold attach on the scored corpus
      "q228_good_turing", // 1-row spectrum-totals attach on the <=20-row frame
      "q230_hbos", // 1-row corpus-count attach on the histogram-scored scan
      "q231_jackknife_se", // 1-row totals + 1-row grid-sum attaches on the |sources|-bounded frame
      "q232_cka", // q115's 1-row moment aggregate crossed with the 2080-row triangle frame
      "q233_segmented_ols", // 1-row totals + 1-row level-1-cut attaches on the day grid
      "q234_label_noise", // dense-model build (q122's plan) under the noise cross-tab
      "q235_holdout_ppl", // 1-row train-vocab attach on the test bigram stream
      "q239_slice_parity", // dense-model build (q122's plan) under the slice rollup
      "q242_uncertainty", // dense-model build (q122's plan) under the margin window
      "q243_simpson", // 1-row pooled-moment attach on the |sources|-bounded frame
      "q244_assoc_rules", // 1-row order-total attach on the pair-bounded rule frame
      "q245_roc_auc", // dense-model build (q122's plan) under the rank sum — same 1-row attaches as q242
      "q248_topk_churn", // <=k matched frame theta-joined against the broadcast k-row depth grid (k*k bounded) + 1-row cut/size attaches
      "q251_source_influence", // broadcast |sources|+1-row helds frame crossed with the shared count scan (ablation-by-subtraction) + 1-row n_eval/full-model attaches
      "q255_ann_mrr", // q25/q29's broadcast-query theta joins + 1-row MRR-summary attach on the |queries|-row frame
      "q256_neardup_split", // two 1-row leak-count attaches on the 1-row policy count frames
      "q262_dsir_selection", // two 1-row token-total attaches on the bucket-joined doc frame
      "q264_cuped", // 1-row pooled-moment attach on the 2-row arm frame
      "q265_l_diversity", // q173's 3-row threshold attach on the QI-bounded class frame
      "q279_hybrid_rrf", // q67's 1-row BM25-stats attach + the 1-row dense-query-vector attach (both fusion inputs are top-N-bounded)
      "q281_t_closeness", // dense class×band grid attach (|QI domain| × |band domain| bounded) + 1-row totals + 3-row threshold attaches
      "q283_semantic_contam") // q25's broadcast-query theta join (bounded eval set × train scan) + 1-row eval-count attach
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val p = plan(n)
      val bad =
        (if (p.contains("CartesianProduct")) Seq(s"$n:cartesian") else Nil) ++
        (if (p.contains("BroadcastNestedLoopJoin") && !bnljByDesign(n))
          Seq(s"$n:bnlj") else Nil)
      bad
    }
    assert(offenders.isEmpty, s"unplanned quadratic joins: $offenders")
  }

  test("scale simulation: star joins survive broadcast demotion unchanged") {
    // At 100 TB customer/supplier/part outgrow the broadcast threshold and
    // their joins demote to shuffle joins. Simulate by disabling size-based
    // broadcast (the explicit hints on bounded dims still apply) and assert
    // bit-identical results through the demoted plan.
    def rows(q: String) = SparkEntry.queries(q)(spark, sf).collect().toSeq
    val before = Seq("q03_top_revenue", "q35_region_revenue", "q71_volume_shipping")
      .map(q => q -> rows(q)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      for ((q, want) <- before) {
        val p = plan(q)
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"$q: expected a demoted (non-broadcast) join under threshold=-1")
        assert(rows(q) == want, s"$q: demoted plan changed the result")
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q107: checkpoints are conditional sums, not a row-multiplying theta join") {
    val p = plan("q107_vocab_growth")
    // every BNLJ must be a 1-row bounds/combine attach (IdentityBroadcast
    // of an aggregate), never a 10-row checkpoint frame joined on <=
    // against the corpus-sized vocab frame
    assert(p.contains("stack"), "checkpoint unpivot should plan as stack")
    // the old formulation planned `first_doc <= cp_doc_id` as an INNER
    // BNLJ; the only joins allowed now are condition-free Cross attaches
    // of 1-row aggregates
    assert(!p.contains("Join type: Inner") && !p.contains("Join condition: ("),
      "no conditioned join may remain; checkpoints are evaluated per-row")
  }

  test("q88: repetition scoring is scan-local (no exchange before the sort)") {
    val p = plan("q88_repetition")
    // one exchange for the corpus spread + one for the final sort; no
    // join/aggregate exchanges in between
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"))
  }
}
