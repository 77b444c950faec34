package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Pin
import graft.core.Tables

/** Index/model/data EVALUATION operators — the measurement half of the
  * pipeline: ANN index recall against exact ground truth, class-balanced
  * loss weights, embedding dispersion (diversity), int8 quantization
  * error, behavioral Markov transition structure, and time-decayed
  * activity. Everything integer / fixed-point exact against the DuckDB
  * oracle (the repo's q158/q162 conventions).
  */
object Evaluation {

  // --------------------------------------------------- q179 ANN recall@k

  /** q179 — recall@k of the IVF index (q29's plan) against brute-force
    * exact top-k (q25's plan): THE metric that decides whether an ANN
    * index's nlist/nprobe trade-off is acceptable before it serves a
    * retrieval or near-dup pipeline. Per query: |IVF∩exact| / k.
    *
    * Scale shape: both sides reuse the existing bounded-probe plans (the
    * brute side is the ground-truth oracle, restricted to the pinned
    * query set — never corpus×corpus); the comparison is one equi-join on
    * (query, neighbor) plus a query-keyed count. Integer hits; recall is
    * one terminal division. */
  def annRecall(spark: SparkSession, embs: DataFrame, k: Int = 10): DataFrame = {
    val brute = Similarity.bruteForceTopK(spark, embs, k = k)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfTopK(spark, embs, k = k)
      .select(col("query_id"), col("neighbor_id"))
    val truth = brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
    val retrieved = ivf.groupBy(col("query_id")).agg(count(lit(1)).as("n_ivf"))
    val hits = ivf.join(brute, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    truth.join(retrieved, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true"),
        coalesce(col("n_ivf"), lit(0L)).as("n_ivf"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall_at_k"))
      .orderBy(col("query_id"))
  }

  // ------------------------------------------------ q203 ANN NDCG@k

  /** q203 — rank-aware ANN audit: NDCG@k of the IVF retrieval against
    * the brute-force ground truth (binary relevance = membership in the
    * true top-k; discount 1/log₂(i+1), Järvelin & Kekäläinen 2002).
    * q179's recall treats a hit at rank 1 and rank 10 identically; NDCG
    * is the complementary "did the index also preserve the ORDER"
    * number — the one a retrieval-backed curation pipeline quotes.
    *
    * Determinism: each position's discount is the pinned double chain
    * ln2/ln(i+1) on integer ranks; the ≤k-term DCG/IDCG sums go through
    * floor(term·1e15) decimals (order-free); NDCG is one terminal
    * division. IDCG sums the first n_true ideal positions, so a query
    * with fewer than k true neighbors is still normalized to [0,1].
    *
    * Scale shape: both retrieval sides reuse the bounded-probe q25/q29
    * plans (broadcast query set, never corpus×corpus); the relevance
    * check is one (query, neighbor) semi-join; everything after is
    * query-keyed ≤k-row aggregation. */
  def annNdcg(spark: SparkSession, embs: DataFrame, k: Int = 10): DataFrame = {
    def disc(rank: org.apache.spark.sql.Column) =
      lit(math.log(2.0)) / Pin.grid9(log(rank.cast("double") + lit(1.0)))
    def fp(x: org.apache.spark.sql.Column) =
      floor(x * lit(1e15)).cast("decimal(38,0)")
    val brute = Similarity.bruteForceTopK(spark, embs, k = k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val ivf = Similarity.ivfTopK(spark, embs, k = k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val hits = ivf.join(brute.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id"), "left_semi")
    val dcg = hits.groupBy(col("query_id"))
      .agg(sum(fp(disc(col("rank")))).as("dq"))
    val ideal = brute.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_true"), sum(fp(disc(col("rank")))).as("iq"))
    ideal.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true"),
        (coalesce(col("dq"), lit(0L)).cast("double") / lit(1e15)).as("dcg"),
        (col("iq").cast("double") / lit(1e15)).as("idcg"),
        (coalesce(col("dq"), lit(0L)).cast("double") /
          col("iq").cast("double")).as("ndcg"))
      .orderBy(col("query_id"))
  }

  // --------------------------------------- q180 class-balanced weights

  /** q180's pinned re-weighting smoothing factor (Cui et al., CVPR'19). */
  private[graft] val CbBeta = 0.999

  /** q180 — class-balanced loss weights from the effective number of
    * samples E_n = (1−β^n)/(1−β): the standard long-tail re-weighting a
    * classifier-filter training run applies per label. Weights are
    * 1/E_n, normalized to mean 1 over the label set.
    *
    * Determinism: β^n as exp(n·ln β) — the repo's pinned ln/exp chain
    * (libm parity verified by every fixed-point oracle); the |labels|-row
    * weight normalizer sums floor(raw·1e15) decimals, order-free; the
    * normalized weight is one terminal IEEE chain. Scale shape: one
    * label-keyed count, then |labels|-row arithmetic. */
  def classWeights(embs: DataFrame): DataFrame = {
    val n = embs.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val effN = (lit(1.0) -
      Pin.grid9(exp(col("n").cast("double") * lit(math.log(CbBeta))))) /
      (lit(1.0) - lit(CbBeta))
    val withRaw = n.withColumn("eff_n", effN)
      .withColumn("raw", lit(1.0) / col("eff_n"))
    val norm = withRaw.agg(
      sum(floor(col("raw") * lit(1e15)).cast("decimal(38,0)")).as("sr"),
      count(lit(1)).as("nl"))
    withRaw.crossJoin(broadcast(norm))
      .select(col("label"), col("n"), col("eff_n"),
        (col("raw") * col("nl").cast("double") /
          (col("sr").cast("double") / lit(1e15))).as("weight"))
      .orderBy(col("label"))
  }

  // --------------------------------------- q181 embedding dispersion

  /** q181 — per-label embedding dispersion: mean squared norm and mean
    * PAIRWISE squared Euclidean distance — the diversity number SemDeDup-
    * style pruning and cluster-quality checks read. Computed EXACTLY
    * without any pairwise product via the sum-vector identity
    * Σ_{i≠j}‖vi−vj‖² = 2n·Σ‖vi‖² − 2‖Σvi‖², on vectors quantized to the
    * 1e-9 grid (floor(x·1e9) per component — the statistic is DEFINED on
    * the grid, so every sum is integer and order-free; decimal(38,0)
    * squares since (1e9·x)² exceeds long range).
    *
    * Scale shape: one posexplode scan (rows×dim), one (label, dim)
    * partial+final integer sum — 64·|labels| keys — and a |labels|-row
    * final. Corpus-linear, shuffle of dim-key aggregates only; the
    * O(n²) pair space is never touched. */
  def embedDispersion(embs: DataFrame): DataFrame = {
    val xq = floor(col("x").cast("double") * lit(1e9)).cast("long")
    val terms = embs
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("vec_id"), col("dim"), xq.as("xq"))
    val perDim = terms.groupBy(col("label"), col("dim"))
      .agg(sum(col("xq")).as("s1"),
        sum(col("xq").cast("decimal(38,0)") * col("xq").cast("decimal(38,0)"))
          .as("sq"))
    val nPer = embs.groupBy(col("label")).agg(count(lit(1)).as("n"))
    perDim.groupBy(col("label"))
      .agg(sum(col("s1").cast("decimal(38,0)") * col("s1").cast("decimal(38,0)"))
          .as("s2"),
        sum(col("sq")).as("sqsum"))
      .join(broadcast(nPer), Seq("label"))
      // hi/lo split before the double cast: these decimals exceed 2^53,
      // and DuckDB's int128->double conversion is not correctly rounded
      // (two roundings via 64-bit halves) while the JVM's BigDecimal
      // .doubleValue is — the SAME explicit split makes both engines
      // compute the identical 2-rounding value (round-11 sweep)
      .withColumn("sqd", expr(
        "CAST(sqsum DIV 4294967296 AS DOUBLE) * 4294967296.0" +
          " + CAST(sqsum % 4294967296 AS DOUBLE)"))
      .withColumn("s2d", expr(
        "CAST(s2 DIV 4294967296 AS DOUBLE) * 4294967296.0" +
          " + CAST(s2 % 4294967296 AS DOUBLE)"))
      .select(col("label"), col("n"),
        (col("sqd") / lit(1e18) / col("n").cast("double"))
          .as("mean_sq_norm"),
        ((lit(2.0) * col("n").cast("double") * (col("sqd") / lit(1e18)) -
          lit(2.0) * (col("s2d") / lit(1e18))) /
          (col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
          .as("mean_pair_sq_dist"))
      .orderBy(col("label"))
  }

  // --------------------------------------------- q182 quantization error

  /** q182 — int8 quantization reconstruction error per label under q68's
    * exact scheme (per-vector symmetric scale 127/max|x|): MSE and worst
    * per-dimension error — the calibration report read before an ANN
    * index switches to int8 storage (q72's shortlist path).
    *
    * Determinism: the dequantized value round(x·s)·max_abs/127 is the
    * identical IEEE chain in both engines; squared errors are summed as
    * floor(err·1e18) decimals (order-free; errors are ≤(max_abs/254)²,
    * so 1e18 scaling keeps precision); max is order-free. Scale shape:
    * one posexplode scan, one label-keyed partial+final — corpus-linear,
    * no shuffle before the aggregate. */
  def quantError(embs: DataFrame): DataFrame = {
    val e = col("x").cast("double")
    val maxAbs = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val scale = when(col("max_abs") === lit(0.0), lit(0.0))
      .otherwise(lit(127.0) / col("max_abs"))
    val deq = when(col("max_abs") === lit(0.0), lit(0.0))
      .otherwise(round(e * scale) * col("max_abs") / lit(127.0))
    val err = (e - deq) * (e - deq)
    embs.select(col("label"), col("vec_id"), maxAbs.as("max_abs"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), err.as("err"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_values"),
        (sum(floor(col("err") * lit(1e18)).cast("decimal(38,0)")).cast("double") /
          lit(1e18)).as("sse"),
        max(col("err")).as("max_sq_err"))
      .select(col("label"), col("n_values"),
        (col("sse") / col("n_values").cast("double")).as("mse"),
        col("max_sq_err"))
      .orderBy(col("label"))
  }

  // --------------------------------------------- q183 Markov transitions

  /** q183 — first-order Markov transition matrix over per-user event
    * streams: P(next event type | event type), the behavioral structure
    * report (and the generative model behind session simulation). The
    * lag/lead windows reuse q19's (ts, event_id) total order.
    *
    * Scale shape: one user-keyed window (the Tables.events spread-guard
    * exchange on user_id is consumed directly — no extra shuffle), one
    * (from, to) partial+final count over |types|² keys, probabilities by
    * one broadcast join + terminal division. */
  def markovChain(spark: SparkSession, dir: String): DataFrame =
    markovTransitions(Tables.events(spark, dir))

  /** Transition matrix over any (user_id, ts, event_id, event_type) frame. */
  def markovTransitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("prob"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // ------------------------------------------------- q247 entropy rate

  /** q247 — entropy rate of the behavioral Markov chain (q183's
    * transitions): H = Σᵢ πᵢ Σⱼ pᵢⱼ ln(1/pᵢⱼ) with the empirical
    * stationary weights πᵢ = n_from/N — equivalently (1/N)·Σᵢⱼ nᵢⱼ·
    * ln(n_from/nᵢⱼ), one number for "how predictable is user behavior"
    * (0 = deterministic paths, ln|states| = uniform wandering), plus
    * the normalized ratio. The sequence-level summary q183's per-edge
    * table doesn't give.
    *
    * Exactness: each term is floor(n·ln(n_from/n)·1e12) — one pinned
    * double chain per edge, summed as integers (order-free); two
    * terminal divisions, the normalizer guarded for the 1-state chain
    * (ANSI double division by zero throws).
    *
    * Scale shape: q183's plan + one ≤|types|²-row aggregate. */
  def entropyRate(ev: DataFrame): DataFrame = {
    val term = floor(col("n").cast("double") *
      Pin.grid9(log(col("n_from").cast("double") / col("n").cast("double"))) *
      lit(1e12)).cast("decimal(19,0)")
    val h = col("hsum").cast("double") / lit(1e12) /
      col("n_transitions").cast("double")
    markovTransitions(ev)
      .agg(sum(col("n")).as("n_transitions"),
        countDistinct(col("from_type")).as("n_states"),
        sum(term).as("hsum"))
      .select(col("n_transitions"), col("n_states"),
        h.as("entropy_rate_nats"),
        when(col("n_states") > 1,
          h / Pin.grid9(log(col("n_states").cast("double"))))
          .otherwise(lit(null).cast("double")).as("normalized"))
  }

  // --------------------------------------------- q184 time-decayed activity

  /** q184 — exponentially time-decayed activity per user (half-life 1
    * day, anchored at the corpus max timestamp): the recency-weighted
    * engagement score feature stores serve. Each event contributes
    * value·2^(−age_days) — computed as exp(−age_days·ln 2) on the pinned
    * ln/exp chain, summed as floor(term·1e12) decimals (order-free).
    * Integer microsecond ages from the epoch-μs twins (unix_micros /
    * epoch_us — q19 convention).
    *
    * Scale shape: one scalar max aggregate broadcast back, then one
    * scan-local term and a user-keyed partial+final sum. */
  def decayActivity(spark: SparkSession, dir: String): DataFrame =
    decayWeighted(Tables.events(spark, dir))

  /** Decay-weighted rollup over any (user_id, ts, value) frame. */
  def decayWeighted(ev: DataFrame): DataFrame = {
    val mx = ev.agg(max(unix_micros(col("ts"))).as("mx"))
    val ageDays = (col("mx") - unix_micros(col("ts"))).cast("double") /
      lit(1e6) / lit(86400.0)
    val term = col("value") * Pin.grid9(exp(-ageDays * lit(math.log(2.0))))
    ev.crossJoin(broadcast(mx))
      .select(col("user_id"), term.as("term"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("term") * lit(1e12)).cast("decimal(38,0)")).cast("double") /
          lit(1e12)).as("decayed_value"))
      .orderBy(col("user_id"))
  }

  // ------------------------------------------- q189 inter-arrival stats

  /** q189 — inter-arrival statistics per event type: mean / exact median
    * gap between consecutive same-type events of the same user, and the
    * implied hourly rate — the arrival-process profile capacity planning
    * and anomaly baselines (q138's bursts) read. Gaps are exact integer
    * microseconds (q19's epoch-μs + (ts, event_id) order conventions);
    * the median is rank-selected (q163's (n+1) DIV 2); means/rates are
    * terminal IEEE chains.
    *
    * Scale shape: one (user, type)-keyed window off the user-keyed
    * spread-guard exchange, one type-keyed count/sum, one rank
    * selection. Nothing quadratic. */
  def interArrival(spark: SparkSession, dir: String): DataFrame =
    interArrivalOf(Tables.events(spark, dir))

  /** Inter-arrival profile over any (user_id, ts, event_id, event_type)
    * frame. */
  def interArrivalOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type"), (col("us") - col("prev_us")).as("gap_us"),
        col("event_id"))
    val c = gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("gap_us")).as("s"))
    val med = gaps
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("gap_us"), col("event_id"))).cast("long"))
      .join(broadcast(c), Seq("event_type"))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("event_type"), col("gap_us").as("med_us"))
    val mean = col("s").cast("double") / col("n").cast("double") / lit(1e6)
    c.join(med, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_gaps"),
        mean.as("mean_gap_s"),
        (col("med_us").cast("double") / lit(1e6)).as("median_gap_s"),
        (lit(3600.0) / mean).as("events_per_hour"))
      .orderBy(col("event_type"))
  }

  // --------------------------------------------- q193 sequential patterns

  /** q193's session gap — q19's 30 minutes. */
  private[graft] val SeqGapUs = 30L * 60L * 1000000L

  /** q193 — session-scoped sequential patterns: for every ordered pair of
    * event types (a ⇒ b), in how many sessions does a's FIRST occurrence
    * precede b's — the "viewed then purchased" style market-basket
    * SEQUENCE mining (the ordered complement of q145's co-occurrence
    * Apriori and q183's adjacent-only Markov matrix). Support = pattern
    * sessions / total sessions.
    *
    * Determinism: first occurrences are integer epoch-μs minima;
    * precedence compares (us, type) lexicographically so equal-μs firsts
    * still order identically in both engines. Scale shape: q19's
    * sessionization windows (the user-keyed exchange), one (user,
    * session, type) min-aggregate, then a session-keyed self-join of ≤
    * |event types| rows per key — the pair space is |types|²-bounded per
    * session, never event-quadratic. Session total = Σ new-session flags
    * (no second pass). */
  def seqPatterns(spark: SparkSession, dir: String): DataFrame =
    seqPatternsOf(Tables.events(spark, dir))

  /** Pattern mining over any (user_id, ts, event_id, event_type) frame. */
  def seqPatternsOf(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > SeqGapUs, 1L)
          .otherwise(0L))
      .withColumn("ses", sum(col("new_session")).over(run))
    val total = tagged.agg(sum(col("new_session")).as("n_sessions"))
    val firsts = tagged.groupBy(col("user_id"), col("ses"), col("event_type"))
      .agg(min(col("us")).as("us"))
    val fa = firsts.select(col("user_id"), col("ses"),
      col("event_type").as("first_type"), col("us").as("ua"))
    val fb = firsts.select(col("user_id").as("ub_user"), col("ses").as("ub_ses"),
      col("event_type").as("then_type"), col("us").as("ub"))
    fa.join(fb,
        col("user_id") === col("ub_user") && col("ses") === col("ub_ses") &&
          (col("ua") < col("ub") ||
            (col("ua") === col("ub") && col("first_type") < col("then_type"))) &&
          col("first_type") =!= col("then_type"))
      .groupBy(col("first_type"), col("then_type"))
      .agg(count(lit(1)).as("n_pattern_sessions"))
      .crossJoin(broadcast(total))
      .select(col("first_type"), col("then_type"), col("n_pattern_sessions"),
        col("n_sessions"),
        (col("n_pattern_sessions").cast("double") / col("n_sessions").cast("double"))
          .as("support"))
      .orderBy(col("first_type"), col("then_type"))
  }

  // ---------------------------------------------------------- registry

  // ---------------------------------------------- q215 matryoshka recall

  /** q215's pinned prefix-dimension ladder and list depth. */
  private[operators] val MatDims = Seq(8, 16, 32)
  private[operators] val MatK = 10

  /** q215 — matryoshka (prefix-dimension) retrieval audit: recall@k of
    * cosine top-k computed on only the FIRST m dims against the full-dim
    * ground truth, for m ∈ [[MatDims]] — the curve that decides how far
    * an MRL-style embedding (Kusupati et al. 2022) can be truncated
    * before retrieval degrades, i.e. how much index memory/bandwidth a
    * deployment can save. Complements q179 (index-approximation loss)
    * with the REPRESENTATION-truncation loss.
    *
    * Determinism: each prefix ranking reuses q25's exact machinery
    * (cosine values bit-equal cross-engine, ties by neighbor_id);
    * hits are integers, recall is one terminal division; the (dims,
    * query) grid is zero-filled so a fully-missed query still reports.
    *
    * Scale shape: per m, the same broadcast-query × corpus scan as q25
    * (queries bounded, never corpus×corpus) with a query-partitioned
    * top-k window; the union is |MatDims| scans (a production run would
    * fuse them into one pass emitting all prefixes — kept separate here
    * for plan clarity); everything after runs on |MatDims|·queries·k
    * rows. */
  def matryoshkaRecall(spark: SparkSession, embs: DataFrame,
                       k: Int = MatK): DataFrame = {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val truth = Similarity.bruteForceTopK(spark, embs, k = k)
      .select(col("query_id"), col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val prefixTop = MatDims.map { m =>
      val q = embs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), slice(col("embedding"), 1, m).as("qe"))
      val c = embs.select(col("vec_id").as("neighbor_id"),
        slice(col("embedding"), 1, m).as("ne"))
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", VectorFunctions.cosineSim(col("qe"), col("ne")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(lit(m.toLong).as("dims"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionAll _)
    val hits = prefixTop.join(truth, Seq("query_id", "neighbor_id"))
      .groupBy(col("dims"), col("query_id")).agg(count(lit(1)).as("hits"))
    val grid = MatDims.map(m => spark.range(1).select(lit(m.toLong).as("dims")))
      .reduce(_ unionAll _)
      .crossJoin(truth.select(col("query_id")).distinct())
    grid.join(hits, Seq("dims", "query_id"), "left")
      .select(col("dims"), col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall_at_k"))
      .orderBy(col("dims"), col("query_id"))
  }

  // --------------------------------------------------- q255 ANN MRR

  /** q255 — mean reciprocal rank of the EXACT nearest neighbor inside the
    * IVF top-k list: q179 asks "how much of the true top-k does the index
    * return", q203 "does it preserve the order"; MRR answers the
    * first-result question a retrieval UI or RAG context-builder actually
    * cares about — at what rank does the index surface THE closest
    * document (0 if not at all). Standard IR headline metric (Voorhees,
    * TREC-8 1999).
    *
    * Determinism: ranks are integers from the shared q25/q29 retrieval
    * plans (ties broken by neighbor_id); each reciprocal rank is the
    * EXACT integer 1e12 div rank, summed as a long, so the per-query
    * value and the corpus MRR are two/three correctly-rounded terminal
    * divisions applied in the same order by both engines — no
    * order-dependent double summation anywhere.
    *
    * Scale shape: both retrieval sides reuse the bounded-probe q25/q29
    * plans (broadcast pinned query set, never corpus×corpus); on top,
    * one (query, neighbor) left join over ≤k rows per query and one
    * constant-width global aggregate broadcast back onto |queries| rows. */
  def annMrr(spark: SparkSession, embs: DataFrame, k: Int = 10): DataFrame = {
    val truth = Similarity.bruteForceTopK(spark, embs, k = 1)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfTopK(spark, embs, k = k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val ranked = truth.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("neighbor_id").as("true_nn"),
        coalesce(col("rank").cast("long"), lit(0L)).as("ivf_rank"))
      .withColumn("rr_fp",
        when(col("ivf_rank") > 0,
          expr("CAST(1000000000000 AS BIGINT) div ivf_rank"))
          .otherwise(lit(0L)))
    val summary = ranked.agg(sum(col("rr_fp")).as("sum_fp"),
      count(lit(1)).as("n_queries"))
    ranked.crossJoin(broadcast(summary))
      .select(col("query_id"), col("true_nn"), col("ivf_rank"),
        (col("rr_fp").cast("double") / lit(1.0e12)).as("reciprocal_rank"),
        (col("sum_fp").cast("double") / col("n_queries").cast("double") /
          lit(1.0e12)).as("mrr"))
      .orderBy(col("query_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q255_ann_mrr" -> ((s, d) => annMrr(s, Tables.embeddings(s, d))),
    "q215_matryoshka_recall" -> ((s, d) => matryoshkaRecall(s, Tables.embeddings(s, d))),
    "q193_seq_patterns" -> (seqPatterns _),
    "q189_interarrival" -> (interArrival _),
    "q203_ann_ndcg" -> ((s, d) => annNdcg(s, Tables.embeddings(s, d))),
    "q179_ann_recall" -> ((s, d) => annRecall(s, Tables.embeddings(s, d))),
    "q180_class_weights" -> ((s, d) => classWeights(Tables.embeddings(s, d))),
    "q181_embed_dispersion" -> ((s, d) => embedDispersion(Tables.embeddings(s, d))),
    "q182_quant_error" -> ((s, d) => quantError(Tables.embeddings(s, d))),
    "q183_markov_chain" -> ((s, d) => markovChain(s, d)),
    "q247_entropy_rate" -> ((s, d) => entropyRate(Tables.events(s, d))),
    "q184_decay_activity" -> ((s, d) => decayActivity(s, d))
  )

  /** q215's DuckDB twin — GENERATED with one ranked CTE per prefix width
    * so the ladder literals cannot diverge from [[MatDims]]. */
  private def matryoshkaOracle: String = {
    val k = MatK
    val perDim = MatDims.map { m =>
      s"""p$m AS (
         |  SELECT $m AS dims, query_id, neighbor_id
         |  FROM (
         |    SELECT q.query_id, c.neighbor_id,
         |      CAST(row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY list_cosine_similarity(q.qe[1:$m], c.e[1:$m]) DESC,
         |          c.neighbor_id) AS INT) AS rank
         |    FROM q JOIN c ON q.query_id <> c.neighbor_id)
         |  WHERE rank <= $k)""".stripMargin
    }.mkString(",\n")
    val unionAll = MatDims.map(m => s"SELECT * FROM p$m").mkString("\n  UNION ALL ")
    val gridVals = MatDims.map(m => s"($m)").mkString(", ")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS e
       |      FROM embeddings),
       |truth AS (
       |  SELECT query_id, neighbor_id
       |  FROM (
       |    SELECT query_id, neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qe, e) DESC, neighbor_id) AS INT)
       |        AS rank
       |    FROM q JOIN c ON query_id <> neighbor_id)
       |  WHERE rank <= $k),
       |$perDim,
       |tm AS (
       |  $unionAll),
       |hits AS (
       |  SELECT tm.dims, tm.query_id, CAST(count(*) AS BIGINT) AS hits
       |  FROM tm JOIN truth USING (query_id, neighbor_id)
       |  GROUP BY tm.dims, tm.query_id),
       |grid AS (
       |  SELECT CAST(d.dims AS BIGINT) AS dims, t.query_id
       |  FROM (VALUES $gridVals) d(dims)
       |  CROSS JOIN (SELECT DISTINCT query_id FROM truth) t)
       |SELECT g.dims, g.query_id,
       |  COALESCE(h.hits, 0) AS hits,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / ${k.toDouble} AS recall_at_k
       |FROM grid g LEFT JOIN hits h ON h.dims = g.dims AND h.query_id = g.query_id
       |ORDER BY g.dims, g.query_id""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q215_matryoshka_recall" -> matryoshkaOracle,
    // q19 sessionization CTEs + session-keyed first-occurrence self-join
    "q193_seq_patterns" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, event_type, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 30*60*1000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM t),
        |s AS (
        |  SELECT user_id, event_type, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ses
        |  FROM m),
        |tot AS (SELECT CAST(sum(new_session) AS BIGINT) AS n_sessions FROM m),
        |f AS (
        |  SELECT user_id, ses, event_type, CAST(min(us) AS BIGINT) AS us
        |  FROM s GROUP BY user_id, ses, event_type),
        |p AS (
        |  SELECT a.event_type AS first_type, b.event_type AS then_type
        |  FROM f a JOIN f b
        |    ON a.user_id = b.user_id AND a.ses = b.ses
        |   AND (a.us < b.us OR (a.us = b.us AND a.event_type < b.event_type))
        |   AND a.event_type <> b.event_type)
        |SELECT first_type, then_type,
        |  CAST(count(*) AS BIGINT) AS n_pattern_sessions,
        |  tot.n_sessions,
        |  CAST(count(*) AS DOUBLE) / CAST(tot.n_sessions AS DOUBLE) AS support
        |FROM p CROSS JOIN tot
        |GROUP BY first_type, then_type, tot.n_sessions
        |ORDER BY first_type, then_type""".stripMargin,
    // epoch-μs gaps, rank-selected median, terminal mean/rate chains
    "q189_interarrival" ->
      """WITH g AS (
        |  SELECT event_type, event_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |f AS (
        |  SELECT event_type, event_id, CAST(gap_us AS BIGINT) AS gap_us
        |  FROM g WHERE gap_us IS NOT NULL),
        |c AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(gap_us) AS BIGINT) AS s
        |  FROM f GROUP BY event_type),
        |r AS (
        |  SELECT event_type, gap_us, CAST(row_number() OVER (
        |    PARTITION BY event_type ORDER BY gap_us, event_id) AS BIGINT) AS rn
        |  FROM f),
        |med AS (
        |  SELECT r.event_type, r.gap_us AS med_us
        |  FROM r JOIN c USING (event_type)
        |  WHERE r.rn = (c.n + 1) // 2)
        |SELECT c.event_type, c.n AS n_gaps,
        |  CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE) / 1.0e6 AS mean_gap_s,
        |  CAST(med.med_us AS DOUBLE) / 1.0e6 AS median_gap_s,
        |  3600.0 / (CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE) / 1.0e6)
        |    AS events_per_hour
        |FROM c JOIN med USING (event_type) ORDER BY c.event_type""".stripMargin,
    // q25's brute CTEs + q29's IVF CTEs, joined on (query, neighbor)
    // q179's retrieval CTEs with ranks kept; ln2/ln(i+1) discounts,
    // floor(·1e15) HUGEINT DCG/IDCG sums, one terminal division
    "q203_ann_ndcg" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
        |bs AS (
        |  SELECT q.query_id, v.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, v.e) DESC, v.vec_id) AS rank
        |  FROM q JOIN v ON q.query_id <> v.vec_id),
        |br AS (SELECT query_id, neighbor_id, rank FROM bs WHERE rank <= 10),
        |cent AS (SELECT vec_id AS cell, e AS c FROM v WHERE vec_id < 16),
        |ar AS (
        |  SELECT v.vec_id, cent.cell,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(v.e, cent.c) DESC, cent.cell) AS arank
        |  FROM v CROSS JOIN cent),
        |assigned AS (SELECT vec_id AS neighbor_id, cell FROM ar WHERE arank = 1),
        |pr AS (
        |  SELECT q.query_id, cent.cell,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, cent.c) DESC, cent.cell) AS crank
        |  FROM q CROSS JOIN cent),
        |probes AS (SELECT query_id, cell FROM pr WHERE crank <= 4),
        |cand AS (
        |  SELECT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON p.cell = a.cell
        |  WHERE p.query_id <> a.neighbor_id),
        |si AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(qv.e, nv.e) DESC, c.neighbor_id) AS rank
        |  FROM cand c JOIN v qv ON c.query_id = qv.vec_id
        |  JOIN v nv ON c.neighbor_id = nv.vec_id),
        |riv AS (SELECT query_id, neighbor_id, rank FROM si WHERE rank <= 10),
        |hit AS (
        |  SELECT riv.query_id, riv.rank
        |  FROM riv JOIN br ON br.query_id = riv.query_id
        |    AND br.neighbor_id = riv.neighbor_id),
        |dcg AS (
        |  SELECT query_id,
        |    sum(CAST(floor(0.6931471805599453e0
        |      / (floor(ln(CAST(rank + 1 AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
        |      * 1.0e15)
        |      AS HUGEINT)) AS dq
        |  FROM hit GROUP BY query_id),
        |ideal AS (
        |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_true,
        |    sum(CAST(floor(0.6931471805599453e0
        |      / (floor(ln(CAST(rank + 1 AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
        |      * 1.0e15)
        |      AS HUGEINT)) AS iq
        |  FROM br GROUP BY query_id)
        |SELECT i.query_id, i.n_true,
        |  CAST(coalesce(d.dq, 0) AS DOUBLE) / 1.0e15 AS dcg,
        |  CAST(i.iq AS DOUBLE) / 1.0e15 AS idcg,
        |  CAST(coalesce(d.dq, 0) AS DOUBLE) / CAST(i.iq AS DOUBLE) AS ndcg
        |FROM ideal i LEFT JOIN dcg d ON d.query_id = i.query_id
        |ORDER BY i.query_id""".stripMargin,
    // q25's brute CTEs (rank = 1 truth) + q29's IVF CTEs; reciprocal ranks
    // as exact 1e12 div rank integers, one global sum, terminal divisions
    // in the same order as the Scala chain
    "q255_ann_mrr" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
        |bs AS (
        |  SELECT q.query_id, v.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, v.e) DESC, v.vec_id) AS rank
        |  FROM q JOIN v ON q.query_id <> v.vec_id),
        |t1 AS (SELECT query_id, neighbor_id FROM bs WHERE rank = 1),
        |cent AS (SELECT vec_id AS cell, e AS c FROM v WHERE vec_id < 16),
        |ar AS (
        |  SELECT v.vec_id, cent.cell,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(v.e, cent.c) DESC, cent.cell) AS arank
        |  FROM v CROSS JOIN cent),
        |assigned AS (SELECT vec_id AS neighbor_id, cell FROM ar WHERE arank = 1),
        |pr AS (
        |  SELECT q.query_id, cent.cell,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, cent.c) DESC, cent.cell) AS crank
        |  FROM q CROSS JOIN cent),
        |probes AS (SELECT query_id, cell FROM pr WHERE crank <= 4),
        |cand AS (
        |  SELECT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON p.cell = a.cell
        |  WHERE p.query_id <> a.neighbor_id),
        |si AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(qv.e, nv.e) DESC, c.neighbor_id) AS rank
        |  FROM cand c JOIN v qv ON c.query_id = qv.vec_id
        |  JOIN v nv ON c.neighbor_id = nv.vec_id),
        |riv AS (SELECT query_id, neighbor_id, rank FROM si WHERE rank <= 10),
        |rk AS (
        |  SELECT t1.query_id, t1.neighbor_id AS true_nn,
        |    CAST(coalesce(riv.rank, 0) AS BIGINT) AS ivf_rank
        |  FROM t1 LEFT JOIN riv ON riv.query_id = t1.query_id
        |    AND riv.neighbor_id = t1.neighbor_id),
        |rr AS (
        |  SELECT query_id, true_nn, ivf_rank,
        |    CASE WHEN ivf_rank > 0
        |      THEN CAST(1000000000000 AS BIGINT) // ivf_rank
        |      ELSE CAST(0 AS BIGINT) END AS rr_fp
        |  FROM rk),
        |s AS (SELECT CAST(sum(rr_fp) AS BIGINT) AS sum_fp,
        |        CAST(count(*) AS BIGINT) AS n FROM rr)
        |SELECT rr.query_id, rr.true_nn, rr.ivf_rank,
        |  CAST(rr.rr_fp AS DOUBLE) / 1.0e12 AS reciprocal_rank,
        |  CAST(s.sum_fp AS DOUBLE) / CAST(s.n AS DOUBLE) / 1.0e12 AS mrr
        |FROM rr CROSS JOIN s ORDER BY rr.query_id""".stripMargin,
    "q179_ann_recall" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
        |bs AS (
        |  SELECT q.query_id, v.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, v.e) DESC, v.vec_id) AS rank
        |  FROM q JOIN v ON q.query_id <> v.vec_id),
        |br AS (SELECT query_id, neighbor_id FROM bs WHERE rank <= 10),
        |cent AS (SELECT vec_id AS cell, e AS c FROM v WHERE vec_id < 16),
        |ar AS (
        |  SELECT v.vec_id, cent.cell,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(v.e, cent.c) DESC, cent.cell) AS arank
        |  FROM v CROSS JOIN cent),
        |assigned AS (SELECT vec_id AS neighbor_id, cell FROM ar WHERE arank = 1),
        |pr AS (
        |  SELECT q.query_id, cent.cell,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, cent.c) DESC, cent.cell) AS crank
        |  FROM q CROSS JOIN cent),
        |probes AS (SELECT query_id, cell FROM pr WHERE crank <= 4),
        |cand AS (
        |  SELECT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON p.cell = a.cell
        |  WHERE p.query_id <> a.neighbor_id),
        |si AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(qv.e, nv.e) DESC, c.neighbor_id) AS rank
        |  FROM cand c JOIN v qv ON c.query_id = qv.vec_id
        |  JOIN v nv ON c.neighbor_id = nv.vec_id),
        |riv AS (SELECT query_id, neighbor_id FROM si WHERE rank <= 10),
        |tr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true FROM br GROUP BY query_id),
        |re AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_ivf FROM riv GROUP BY query_id),
        |h AS (
        |  SELECT br.query_id, CAST(count(*) AS BIGINT) AS hits
        |  FROM riv JOIN br ON riv.query_id = br.query_id
        |    AND riv.neighbor_id = br.neighbor_id
        |  GROUP BY br.query_id)
        |SELECT tr.query_id, tr.n_true,
        |  coalesce(re.n_ivf, 0) AS n_ivf,
        |  coalesce(h.hits, 0) AS hits,
        |  CAST(coalesce(h.hits, 0) AS DOUBLE) / 10.0 AS recall_at_k
        |FROM tr LEFT JOIN re ON re.query_id = tr.query_id
        |LEFT JOIN h ON h.query_id = tr.query_id
        |ORDER BY tr.query_id""".stripMargin,
    // exp(n·ln β) chain; floor(raw·1e15) HUGEINT normalizer
    "q180_class_weights" ->
      s"""WITH n AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS n
         |  FROM embeddings GROUP BY label),
         |w AS (
         |  SELECT label, n,
         |    (1.0 - floor(exp(CAST(n AS DOUBLE) * ${Pin.sqlDouble(math.log(CbBeta))})
         |      * 1.0e9 + 0.5) / 1.0e9)
         |      / (1.0 - CAST($CbBeta AS DOUBLE)) AS eff_n,
         |    1.0 / ((1.0 - floor(exp(CAST(n AS DOUBLE) * ${Pin.sqlDouble(math.log(CbBeta))})
         |      * 1.0e9 + 0.5) / 1.0e9)
         |      / (1.0 - CAST($CbBeta AS DOUBLE)))
         |      AS raw
         |  FROM n),
         |t AS (
         |  SELECT sum(CAST(floor(raw * 1.0e15) AS HUGEINT)) AS sr,
         |    CAST(count(*) AS BIGINT) AS nl
         |  FROM w)
         |SELECT label, n, eff_n,
         |  raw * CAST(nl AS DOUBLE) / (CAST(sr AS DOUBLE) / 1.0e15) AS weight
         |FROM w CROSS JOIN t ORDER BY label""".stripMargin,
    // sum-vector identity on the 1e-9 integer grid
    "q181_embed_dispersion" ->
      """WITH t AS (
        |  SELECT label, vec_id, u.i AS dim,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1.0e9) AS BIGINT) AS xq
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)),
        |pd AS (
        |  SELECT label, dim, CAST(sum(xq) AS BIGINT) AS s1,
        |    sum(CAST(xq AS HUGEINT) * CAST(xq AS HUGEINT)) AS sq
        |  FROM t GROUP BY label, dim),
        |np AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |       FROM embeddings GROUP BY label),
        |f AS (
        |  SELECT label,
        |    sum(CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)) AS s2,
        |    sum(sq) AS sqsum
        |  FROM pd GROUP BY label),
        |g AS (
        |  SELECT f.label AS label, n,
        |    CAST(sqsum // 4294967296 AS DOUBLE) * 4294967296.0
        |      + CAST(sqsum % 4294967296 AS DOUBLE) AS sqd,
        |    CAST(s2 // 4294967296 AS DOUBLE) * 4294967296.0
        |      + CAST(s2 % 4294967296 AS DOUBLE) AS s2d
        |  FROM f JOIN np ON np.label = f.label)
        |SELECT label, n,
        |  sqd / 1.0e18 / CAST(n AS DOUBLE) AS mean_sq_norm,
        |  (2.0 * CAST(n AS DOUBLE) * (sqd / 1.0e18)
        |   - 2.0 * (s2d / 1.0e18))
        |  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS mean_pair_sq_dist
        |FROM g ORDER BY label""".stripMargin,
    // q68's scale chain; floor(err·1e18) HUGEINT sums
    "q182_quant_error" ->
      """WITH m AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
        |      AS max_abs
        |  FROM embeddings),
        |t AS (
        |  SELECT label,
        |    CASE WHEN max_abs = 0.0 THEN e[u.i] * e[u.i]
        |      ELSE (e[u.i] - round(e[u.i] * (127.0 / max_abs)) * max_abs / 127.0)
        |         * (e[u.i] - round(e[u.i] * (127.0 / max_abs)) * max_abs / 127.0)
        |    END AS err
        |  FROM m, unnest(generate_series(1, len(e))) u(i)),
        |g AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n_values,
        |    CAST(sum(CAST(floor(err * 1.0e18) AS HUGEINT)) AS DOUBLE) / 1.0e18
        |      AS sse,
        |    max(err) AS max_sq_err
        |  FROM t GROUP BY label)
        |SELECT label, n_values, sse / CAST(n_values AS DOUBLE) AS mse, max_sq_err
        |FROM g ORDER BY label""".stripMargin,
    "q247_entropy_rate" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE next_type IS NOT NULL
        |  GROUP BY event_type, next_type),
        |tot AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM tr GROUP BY from_type),
        |tj AS (
        |  SELECT tr.from_type, tr.n, tot.n_from
        |  FROM tr JOIN tot ON tot.from_type = tr.from_type),
        |ag AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_transitions,
        |    CAST(count(DISTINCT from_type) AS BIGINT) AS n_states,
        |    sum(CAST(floor(CAST(n AS DOUBLE)
        |      * (floor(ln(CAST(n_from AS DOUBLE) / CAST(n AS DOUBLE))
        |        * 1.0e9 + 0.5) / 1.0e9) * 1.0e12)
        |      AS BIGINT)) AS hsum
        |  FROM tj)
        |SELECT n_transitions, n_states,
        |  CAST(hsum AS DOUBLE) / 1.0e12 / CAST(n_transitions AS DOUBLE)
        |    AS entropy_rate_nats,
        |  CASE WHEN n_states > 1 THEN
        |    CAST(hsum AS DOUBLE) / 1.0e12 / CAST(n_transitions AS DOUBLE)
        |      / (floor(ln(CAST(n_states AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
        |      END AS normalized
        |FROM ag""".stripMargin,
    "q183_markov_chain" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE next_type IS NOT NULL
        |  GROUP BY event_type, next_type),
        |tot AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM tr GROUP BY from_type)
        |SELECT tr.from_type, tr.to_type, tr.n, tot.n_from,
        |  CAST(tr.n AS DOUBLE) / CAST(tot.n_from AS DOUBLE) AS prob
        |FROM tr JOIN tot ON tot.from_type = tr.from_type
        |ORDER BY tr.from_type, tr.to_type""".stripMargin,
    // epoch-μs ages, exp(−days·ln 2), floor(term·1e12) HUGEINT sums
    "q184_decay_activity" ->
      """WITH mx AS (SELECT max(epoch_us(ts)) AS mx FROM events),
        |t AS (
        |  SELECT user_id,
        |    value * (floor(exp(-(CAST(mx.mx - epoch_us(ts) AS DOUBLE)
        |      / 1.0e6 / 86400.0) * 0.6931471805599453e0) * 1.0e9 + 0.5) / 1.0e9) AS term
        |  FROM events CROSS JOIN mx)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(term * 1.0e12) AS HUGEINT)) AS DOUBLE) / 1.0e12
        |    AS decayed_value
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
