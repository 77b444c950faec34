package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{KmvAggregator, Pin, TextFunctions, VectorFunctions}

/** Dataset assembly & profiling operators — the bookkeeping a training-data
  * pipeline runs around the curation core: cardinality sketches for corpus
  * accounting, deterministic split assignment, and cross-source leakage
  * profiling. All deterministic, all DuckDB-oracled.
  */
object Datasets {

  /** Pinned parameters shared by the queries' defaults AND the generated
    * oracle SQL (one source of truth, per the round-5 advice pattern). */
  private[graft] val KmvK = 64
  private[operators] val ValFrac = 0.1
  private[operators] val TestFrac = 0.2
  private[operators] val OverlapN = 8
  private val Pow60 = 1152921504606846976.0 // 2^60 as double (exact)

  /** q110 — per-source distinct-content estimate via the KMV sketch.
    *
    * Scale shape: the ONLY corpus-sized work is one scan computing h60 per
    * row; the aggregate's partial buffers are ≤ k longs per (partition,
    * source), so the shuffle carries k longs per partition per source —
    * compare `countDistinct`, whose partial state is the full per-partition
    * distinct set. The estimate (k-1)/(h_(k)/2^60) is derived from the
    * sketch alone; sketch_size < k means the sketch IS the exact distinct
    * count. Deterministic: the k smallest distinct hashes are a set
    * property (order- and partitioning-independent), and h60 is the
    * cross-engine md5 prefix, so DuckDB re-derives the identical sketch
    * from a window formulation. */
  def kmvDistinct(docs: DataFrame, k: Int = KmvK): DataFrame = {
    val kmv = udaf(new KmvAggregator(k), org.apache.spark.sql.Encoders.scalaLong)
    docs
      .select(col("source"), TextFunctions.h60(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), kmv(col("h")).as("sketch"))
      .select(col("source"), col("n_docs"),
        size(col("sketch")).as("sketch_size"),
        graft.functions.Sketches.kmvEstimate(col("sketch"), k).as("est_distinct"))
      .orderBy(col("source"))
  }

  /** q111 — deterministic stratified train/val/test assignment.
    *
    * u = h60(doc_id)/2^60 ∈ [0,1): the SAME md5-keyed uniform the sampling
    * family (q48/q63/q81/q89) uses, so assignment is reproducible at any
    * parallelism, any engine, and STABLE under corpus growth — a doc's
    * split never changes when other docs arrive (the property shuffling
    * row numbers cannot give). Scan-local except the output sort: zero
    * shuffles at 100 TB beyond the caller's sink. Thresholds are exact
    * double literals; h60/2^60 is an exact power-of-two division, so the
    * boundary compares are bit-identical cross-engine. */
  def trainSplit(docs: DataFrame, valFrac: Double = ValFrac,
                 testFrac: Double = TestFrac): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
      "val/test fractions must be non-negative and sum below 1")
    val u = TextFunctions.h60(col("doc_id").cast("string")).cast("double") / lit(Pow60)
    docs.select(col("doc_id"), col("source"),
        when(u < lit(1.0 - valFrac - testFrac), "train")
          .when(u < lit(1.0 - testFrac), "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** q112 — cross-source n-gram overlap matrix (train/eval leakage
    * profiling ACROSS domains — the symmetric, all-pairs-of-sources
    * counterpart of q87's train→eval containment probe).
    *
    * Scale shape: shingle → h60 → distinct (source, gram) — the distinct
    * aggregate is partial+final on the gram hash, vocab-bounded; the
    * self-join shuffles on the gram key (bucketed by hash, no broadcast
    * of the corpus) and emits |sources|² bounded rows. Gram hashing keeps
    * the shuffle key 8 bytes instead of an n-word string. Jaccard is one
    * exact integer division pair, deterministic cross-engine. */
  def sourceOverlap(docs: DataFrame, n: Int = OverlapN): DataFrame = {
    VectorFunctions.register(docs.sparkSession)
    val grams = docs
      .select(col("source"),
        explode(VectorFunctions.wordNgramList(col("text"), n)).as("g"))
      .select(col("source"), TextFunctions.h60(col("g")).as("g"))
      .distinct()
    val counts = grams.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    val shared = grams.as("a").join(grams.as("b"), Seq("g"))
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(broadcast(counts.select(col("source").as("source_a"), col("n_grams").as("n_a"))), "source_a")
      .join(broadcast(counts.select(col("source").as("source_b"), col("n_grams").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("shared_grams"),
        col("n_a"), col("n_b"),
        (col("shared_grams").cast("double") /
          (col("n_a") + col("n_b") - col("shared_grams")).cast("double")).as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // --------------------------------------------------------------------- //

  /** q149's pinned HLL geometry: 2^HllP buckets over the 60-bit hash; the
    * remaining 52 bits feed the leading-zero rank. */
  private[graft] val HllP = 8

  /** (bucket, rho) of a 60-bit hash under the pinned p-bit HLL geometry —
    * shared by q149 and the streaming sketch maintenance. */
  private[graft] def hllBucketRho(h: org.apache.spark.sql.Column, p: Int = HllP)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val remBits = 60 - p
    val rem = h.bitwiseAND(lit((1L << remBits) - 1))
    val rho = when(rem === 0, lit(remBits + 1))
      .otherwise(lit(remBits + 1) - length(bin(rem)))
    (shiftright(h, remBits), rho)
  }

  /** q149 — per-source HyperLogLog distinct-content estimate (Flajolet et
    * al., AofA 2007 — public), the CONSTANT-memory counterpart of q110's
    * KMV: per (source, bucket) only the max leading-zero rank survives, so
    * the aggregate state is ≤ 2^p small ints per source no matter the
    * corpus — the sketch a 100 TB profiling pass actually keeps, and it
    * merges across partitions/days by elementwise max.
    *
    * Cross-engine exactness (no float summation anywhere):
    *   bucket = h60 >> 52 (top p=8 bits), rem = h60 & (2^52 − 1),
    *   rho    = 53 − bitlength(rem)  (rem = 0 → 53),
    * where bitlength via `length(bin(x))` in Spark == `length(format('{:b}',
    * x))` in DuckDB — integer-exact, no log2 doubles near power-of-2
    * boundaries. The harmonic sum Σ 2^−rho is scaled by 2^53 into pure
    * long arithmetic (empty buckets contribute 2^53 each; max total 2^61
    * fits a long), and the final estimate α·m²·2^53 / S is ONE double
    * division on an identical IEEE operand chain in both engines. Below
    * 2.5·m with empty buckets the raw estimator is known-biased (it can
    * read ~8× high at n ≈ m/10), so the standard linear-counting branch
    * applies: est = m·ln(m / empty) — the branch predicate and the ln ride
    * the same doubles in both engines (q131's ln precedent). The exact
    * distinct count rides along for error accounting.
    *
    * Scale shape: one scan computing (bucket, rho) scan-locally, ONE
    * partial+final max-aggregate on (source, bucket) — ≤ 256 rows per
    * source ever shuffle — then a per-source fold. Duplicate texts don't
    * need a distinct pass: max(rho) is idempotent under repetition (the
    * property that makes HLL mergeable). */
  def hllDistinct(docs: DataFrame, p: Int = HllP): DataFrame = {
    val m = 1 << p
    val remBits = 60 - p
    val (bucket, rho) = hllBucketRho(TextFunctions.h60(col("text")), p)
    val buckets = docs
      .select(col("source"), bucket.as("bucket"), rho.as("r"))
      .groupBy(col("source"), col("bucket")).agg(max(col("r")).as("mr"))
    // Σ_buckets 2^(53−rho), empty buckets at rho=0 → 2^53 each: scaled
    // harmonic sum as pure long arithmetic
    val scale = 1L << (remBits + 1) // 2^53
    val perSource = buckets.groupBy(col("source")).agg(
      count(lit(1)).as("used"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${remBits + 1} - mr)")).as("s_used"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val sFull = (col("s_used") + (lit(m.toLong) - col("used")) * lit(scale))
      .cast("double")
    val exact = docs.select(col("source"), TextFunctions.h60(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("h")).as("n_distinct"))
    perSource.join(exact, Seq("source"))
      .withColumn("raw",
        alpha * lit(m.toDouble) * lit(m.toDouble) * lit(scale.toDouble) / sFull)
      .select(col("source"), col("n_docs"), col("n_distinct"),
        col("used").as("buckets_used"),
        when(col("raw") <= lit(2.5 * m) && col("used") < lit(m.toLong),
          lit(m.toDouble) * Pin.grid9(
            log(lit(m.toDouble) / (lit(m.toLong) - col("used")).cast("double"))))
          .otherwise(col("raw"))
          .as("hll_est"))
      .orderBy(col("source"))
  }

  // --------------------------------------------------------------------- //

  /** q129's pinned sketch geometry — shared by the defaults AND the oracle. */
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 1024
  private[operators] val CmsTopK = 20

  /** Row r's CMS bucket for a token: h60("r-token") mod width — the
    * cross-engine md5 convention (same family as q26's sign hashes). */
  private def cmsBucket(r: Int, token: org.apache.spark.sql.Column,
                        width: Int): org.apache.spark.sql.Column =
    pmod(TextFunctions.h60(concat(lit(s"$r-"), token)), lit(width.toLong))

  /** All depth buckets packed into one long, 16 bits per row — the single
    * scan-local codegen'd input column [[graft.functions.CmsAggregator]]
    * consumes (one md5 per row per occurrence, no shuffle). */
  private[graft] def cmsPackedBuckets(token: org.apache.spark.sql.Column,
                                      depth: Int, width: Int): org.apache.spark.sql.Column =
    (0 until depth).map(r => shiftleft(cmsBucket(r, token, width), r * 16))
      .reduce(_ + _)

  /** q129 — count-min-sketch heavy hitters: the corpus token-frequency
    * sketch, evaluated against the exact top-`topK` tokens (estimate,
    * exact, and the collision overcount — structurally ≥ 0).
    *
    * Scale shape: the sketch build is ONE aggregate whose partial state is
    * a fixed 4×1024 long grid per partition (CmsAggregator scaladoc) — at
    * 100 TB the shuffle carries 32 KB per partition, not occurrences. The
    * exact top-K side is the evaluation baseline only (itself a
    * partial+final token-keyed aggregate, vocab-bounded after the map-side
    * combine); a production pipeline keeps just the sketch. The probe join
    * is a 1-row broadcast. */
  def cmsHeavyHitters(docs: DataFrame, depth: Int = CmsDepth,
                      width: Int = CmsWidth, topK: Int = CmsTopK): DataFrame = {
    val cms = udaf(new graft.functions.CmsAggregator(depth, width),
      org.apache.spark.sql.Encoders.scalaLong)
    val occ = docs.select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val sketch = occ
      .select(cmsPackedBuckets(col("token"), depth, width).as("pb"))
      .agg(cms(col("pb")).as("sketch"))
    val exact = occ.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token")).limit(topK)
    exact.crossJoin(broadcast(sketch))
      .select(col("token"), col("exact_n"),
        least((0 until depth).map(r =>
          element_at(col("sketch"),
            (lit(r * width) + cmsBucket(r, col("token"), width) + lit(1)).cast("int"))): _*)
          .as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact_n"))
      .orderBy(col("exact_n").desc, col("token"))
  }

  /** q137 — per-source dataset card: the one-row-per-source profile a
    * corpus release ships (doc/token volume, length, language mix with
    * entropy and majority share). The language columns, the entropy fold
    * order, and the oracle SQL all derive from the SAME pinned class list
    * (Classify.MiClasses — the q131 determinism convention).
    *
    * Scale shape: ONE partial+final aggregate keyed by source; every
    * language stat is a conditional-sum column inside it (no per-lang
    * pass, no pivot shuffle). Entropy/majority are fixed double dags over
    * exact longs, computed post-aggregate on |sources| rows. */
  def dataCard(docs: DataFrame,
               classes: Seq[String] = Classify.MiClasses): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("total_tokens"),
      sum(col("n_chars")).as("sum_chars")) ++
      classes.map(c => sum(when(col("lang") === c, 1L).otherwise(0L)).as(s"n_$c"))
    val m = docs.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
    val nD = col("n_docs").cast("double")
    def entTerm(c: String): org.apache.spark.sql.Column =
      when(col(s"n_$c") === 0L, lit(0.0)).otherwise(
        -(col(s"n_$c").cast("double") / nD) *
          Pin.grid9(log(col(s"n_$c").cast("double") / nD)))
    m.select(col("source"), col("n_docs"), col("total_tokens"),
        (col("sum_chars").cast("double") / nD).as("mean_chars"),
        classes.map(entTerm).reduce(_ + _).as("lang_entropy"),
        (greatest(classes.map(c => col(s"n_$c")): _*).cast("double") / nD)
          .as("majority_share"))
      .orderBy(col("source"))
  }

  /** q154's pinned sample size. */
  private[operators] val ResK = 100

  /** q154 — weighted sampling WITHOUT replacement via the
    * Efraimidis–Spirakis key (IPL 2006, public): each doc draws the
    * deterministic uniform u = h60(doc_id)/2^60 and ranks by u^(1/w),
    * w = n_chars; the top-k keys are EXACTLY a w-weighted draw without
    * replacement. Complements q144's PPS-Bernoulli (random SIZE, with HT
    * weights) — q154 returns exactly k docs, the shape a fixed-budget
    * eval-set carve wants.
    *
    * Cross-engine key: ranked by ln(u)/w — the same ORDER as u^(1/w)
    * (ln is monotone, w > 0) WITHOUT `pow`, whose libm implementations
    * are not correctly-rounded and differ between engines; ln on dyadic
    * rationals is the q92/q131-proven bit-matched path, and the division
    * by an integer weight is a single IEEE op. Zero-weight docs are
    * excluded (u^(1/w) → 0), mirrored in the oracle.
    *
    * Scale shape: the key is scan-local; top-k plans as
    * TakeOrderedAndProject (per-partition heaps, k rows to the driver
    * stage) — ONE pass, no sort materialization, no window, at any
    * corpus size. Stability: keys never change, so corpus growth only
    * displaces the boundary entries. */
  def weightedReservoir(docs: DataFrame, k: Int = ResK): DataFrame = {
    val u = TextFunctions.h60(col("doc_id").cast("string")).cast("double") /
      lit(Pow60)
    docs.filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (Pin.grid9(log(u)) / col("n_chars").cast("double")).as("ln_key"))
      .orderBy(col("ln_key").desc, col("doc_id"))
      .limit(k)
  }

  /** q157 — per-source Gini concentration of document length: how
    * unequally the token/char budget is spread across a source's docs
    * (G = 0 all-equal, → 1 a few giants carry everything) — the data-card
    * inequality stat that flags sources whose "volume" is really a
    * handful of mega-documents. Rank formula (ties broken by doc_id, the
    * convention pinned on both engines):
    *   G = (2·Σ r·x − (n+1)·Σx) / (n·Σx)
    *
    * Exactness: Σ r·x rides decimal(38,0) (r ≤ n, x ≤ doc length — the
    * product is < 1e38 up to ~1e19 rank·chars), the numerator/denominator
    * are exact decimal products, and G is ONE double division. No float
    * summation anywhere.
    *
    * Scale shape: one rank window per source (the q133 shuffle) feeding
    * one partial+final per-source aggregate — the same single exchange,
    * |sources| output rows. */
  def giniConcentration(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
    val ranked = docs.select(col("source"), col("n_chars"),
      row_number().over(w).cast("long").as("r"))
    ranked.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(dec(col("r")) * dec(col("n_chars"))).cast("decimal(38,0)").as("srx"))
      .select(col("source"), col("n_docs"), col("sum_chars"),
        ((dec(lit(2)) * col("srx")
          - dec(col("n_docs") + 1) * dec(col("sum_chars"))).cast("double")
          / (dec(col("n_docs")) * dec(col("sum_chars"))).cast("double"))
          .as("gini"))
      .orderBy(col("source"))
  }

  /** q158's fixed-point scale for order-free KL term summation. */
  private val KlScale = 1e15

  /** q158 — per-source KL divergence from the corpus unigram
    * distribution: KL(P_source ‖ P_corpus) = Σ_w p·ln(p/q) — the
    * domain-distance score data-selection pipelines rank sources by (a
    * source far from the mixture is novel or noisy; the DSIR/importance
    * family's distributional summary). No smoothing needed: every source
    * word is in the corpus, so q > 0 always.
    *
    * Determinism: a vocabulary-sized Σ of doubles is IEEE-order-
    * sensitive, so each term rides the q109 fixed-point trick —
    * floor(term·1e15) summed as decimal(38,0) is exact, order-free, and
    * identical cross-engine (each term is a pinned dag: p·(ln c_s + ln N
    * − ln n_s − ln c), the q131 ln convention; the 1e-15 truncation is
    * the SAME on both engines, so it cancels in the compare). |term| < 40
    * ⇒ scaled < 4e16 per term, Σ < 1e38 up to ~2e21 vocab — decimal38
    * headroom at any corpus.
    *
    * Scale shape: one (source, word)-keyed count aggregate is the only
    * corpus-sized shuffle; the corpus distribution derives from IT (one
    * vocab-keyed re-aggregate, no second scan); per-source totals and the
    * 1-row N broadcast back onto the vocab-bounded term frame. */
  def klDivergence(docs: DataFrame): DataFrame = {
    val cs = docs
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_s"))
    val corpus = cs.groupBy(col("w")).agg(sum(col("c_s")).as("c"))
    val ns = cs.groupBy(col("source"))
      .agg(sum(col("c_s")).as("n_s"), count(lit(1)).as("vocab_s"))
    val nRow = corpus.agg(sum(col("c")).as("n"))
    // difference-paired chain (ln c_s − ln c) + (ln N − ln n_s): when
    // P == Q the pairs cancel EXACTLY (x − x = 0), so a single-source
    // corpus scores 0.0, not a floor-truncated −1e-14 — and both pairs
    // subtract same-magnitude values, which is also the better-
    // conditioned order in general
    val term = (col("c_s").cast("double") / col("n_s").cast("double")) *
      ((Pin.grid9(log(col("c_s").cast("double"))) -
         Pin.grid9(log(col("c").cast("double"))))
        + (Pin.grid9(log(col("n").cast("double"))) -
           Pin.grid9(log(col("n_s").cast("double")))))
    val sums = cs.join(corpus, Seq("w"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nRow))
      .select(col("source"),
        floor(term * lit(KlScale)).cast("decimal(38,0)").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).cast("decimal(38,0)").as("sc"))
    sums.join(broadcast(ns), Seq("source"))
      .select(col("source"), col("n_s").as("n_tokens"),
        col("vocab_s").as("vocab_size"),
        (col("sc").cast("double") / lit(KlScale)).as("kl"))
      .orderBy(col("source"))
  }

  /** q139's pinned sample-size target — shared by the default AND the
    * generated oracle. */
  private[operators] val PpsTarget = 100L
  private val Pow60Dec = "1152921504606846976" // 2^60 exact integer literal

  /** q144 — probability-proportional-to-size Bernoulli sample: include a
    * doc with probability min(1, c·w/W), w = n_chars, W = Σw — the
    * length-weighted counterpart of the uniform q48/q111 family (long
    * docs carry more training tokens; PPS keeps the token budget honest),
    * with the Horvitz–Thompson weight 1/p for unbiased downstream sums.
    *
    * Scale shape: ONE 1-row total aggregate (partial+final long sum)
    * broadcast back over the scan — the decision h60(doc_id)·W < c·w·2^60
    * is scan-local, so the operator is a single pass with a 1-row side
    * input at any corpus size; no sort, no window, no per-group state.
    *
    * Determinism: the inclusion test is pure integer arithmetic in
    * decimal(38,0) (h60 < 2^60 ≈ 1.2e18, W ≤ ~1e14 at 100 TB text → the
    * product stays < 1e33 < 1e38; DuckDB runs the same compare in
    * HUGEINT), and p/weight are single IEEE divisions of exact integers —
    * bit-identical cross-engine. Same stability property as q111: a doc's
    * inclusion threshold c·w/W moves only when the CORPUS total moves,
    * and the h60 keys are fixed, so refreshes re-sample minimally. */
  def ppsSample(docs: DataFrame, c: Long = PpsTarget): DataFrame = {
    val tot = docs.agg(sum(col("n_chars")).as("w_total"))
    val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
    val h = TextFunctions.h60(col("doc_id").cast("string"))
    docs.crossJoin(broadcast(tot))
      .filter(dec(h) * dec(col("w_total")) <
        dec(lit(c)) * dec(col("n_chars")) * dec(lit(Pow60Dec)))
      .select(col("doc_id"), col("source"), col("n_chars"),
        least(lit(1.0), (lit(c.toDouble) * col("n_chars").cast("double")) /
          col("w_total").cast("double")).as("p_include"))
      .withColumn("ht_weight", lit(1.0) / col("p_include"))
      .orderBy(col("doc_id"))
  }

  /** q139 — pairwise source-overlap estimate from KMV sketches: the
    * sketch-based alternative to q112's exact gram self-join. For each
    * source pair, merge the two k-min sketches (k smallest of the union
    * — valid because each side holds ITS k smallest distinct hashes),
    * count how many of the merged sketch's values appear in BOTH input
    * sketches → Jaccard estimate ρ = shared/k', union estimate from the
    * k'-th smallest, intersection ≈ ρ · union (Beyer et al. 2007, the
    * standard KMV set-operation estimators).
    *
    * Scale shape: THE point of the sketch — the only corpus-sized work is
    * the gram scan feeding one partial+final KMV aggregate (≤ k longs per
    * partition per source, vs q112 shuffling the full distinct gram set
    * and self-joining it). The pair stage is |sources|² rows of k-long
    * arrays — row-local array ops on a broadcast-sized frame. At 100 TB
    * q112 is the audit; THIS is what runs daily.
    *
    * Determinism: sketches are set properties of the hash sets (KMV
    * scaladoc); merge/intersect/estimates are integer array ops + single
    * IEEE divisions — the oracle re-derives identical sketches via SQL
    * windows. */
  def kmvOverlap(docs: DataFrame, k: Int = KmvK, n: Int = OverlapN): DataFrame = {
    VectorFunctions.register(docs.sparkSession)
    val kmv = udaf(new KmvAggregator(k), org.apache.spark.sql.Encoders.scalaLong)
    val sk = docs
      .select(col("source"), explode(VectorFunctions.wordNgramList(col("text"), n)).as("g"))
      .select(col("source"), TextFunctions.h60(col("g")).as("h"))
      .groupBy(col("source")).agg(kmv(col("h")).as("sk"))
    val merged = graft.functions.Sketches.kmvMerge2(col("a.sk"), col("b.sk"), k)
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.sk").as("ska"), col("b.sk").as("skb"), merged.as("mu"))
      .select(col("source_a"), col("source_b"),
        size(col("mu")).as("k_used"),
        size(array_intersect(array_intersect(col("mu"), col("ska")), col("skb")))
          .as("shared_in_sketch"),
        when(size(col("mu")) < k, size(col("mu")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("mu"), k).cast("double") / lit(Pow60)))
          .as("est_union"))
      .withColumn("est_jaccard",
        col("shared_in_sketch").cast("double") / col("k_used").cast("double"))
      .withColumn("est_shared", col("est_jaccard") * col("est_union"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q169's pinned quantiles (percent). */
  private[operators] val HistQuantiles = Seq(50, 90, 99)

  /** q169 — histogram-quantile estimation with exact error accounting: per
    * source, the p50/p90/p99 of doc length read from the power-of-two
    * bucket histogram (the q166 binning), next to the EXACT rank-selected
    * value. This is the constant-memory quantile path a 100 TB profiling
    * pass actually ships — the histogram is ~60 counters per source and
    * merges by elementwise add (the Sketches CMS algebra) — with the
    * exact twin as the on-harness error audit.
    *
    * Exactness/determinism: target rank = ceil(q·n/100) in pure integers
    * ((q·n + 99) div 100); the bucket estimate is the smallest bucket
    * whose cumulative count reaches the rank (integer argmin); the exact
    * value is a (n_chars, doc_id)-ordered rank selection (q163's
    * convention). Zero floats anywhere.
    *
    * Scale shape: one (source, bucket) aggregate + one |sources×buckets|
    * window for the estimates; one per-source rank window for the exact
    * twin (a production run drops the twin and keeps the histogram). */
  def histQuantiles(docs: DataFrame): DataFrame = {
    val ns = docs.groupBy(col("source")).agg(count(lit(1)).cast("long").as("n"))
    val targets = ns.select(col("source"), col("n"),
        explode(typedLit(HistQuantiles)).as("q"))
      .withColumn("target", expr("(q * n + 99) DIV 100"))
    val hist = docs
      .select(col("source"),
        (length(bin(col("n_chars"))) - lit(1)).cast("long").as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("bucket"))))
    val est = targets.join(hist, Seq("source"))
      .filter(col("cum") >= col("target"))
      .groupBy(col("source"), col("q"), col("target"))
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est_lo", expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"))
    val wr = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val exact = docs.withColumn("rn", row_number().over(wr).cast("long"))
      .select(col("source"), col("rn"), col("n_chars").as("exact_value"))
    est.join(exact, est("source") === exact("source") && col("target") === col("rn"))
      .select(est("source"), col("q"), col("target").as("target_rank"),
        col("bucket"), col("est_lo"), col("exact_value"))
      .orderBy(est("source"), col("q"))
  }

  /** q170 — two-sample Kolmogorov-Smirnov drift statistic per source
    * against the corpus: D = max over observed lengths v of
    * |ECDF_source(v) − ECDF_corpus(v)| — the standard "did this source's
    * distribution drift from the rest" test a crawl-monitoring pass runs
    * per release.
    *
    * Exactness: the max runs over INTEGER cross-multiplied numerators
    * |cum_s·n − cum·n_s| (both denominators are constant per source, so
    * the float division commutes with the max) in decimal(38,0) — exact
    * past 1e12-doc corpora where the long product would overflow — and
    * the witness value `at_value` is the smallest v attaining the max.
    * One double division at the end.
    *
    * Scale shape: the ECDFs collapse to (distinct length, count) first —
    * score-cardinality-bounded, the q150 move — so the source×value grid
    * is |sources|·|distinct lengths| rows (bounded), filled by one
    * source-partitioned cumulative window; corpus-sized work is the two
    * value aggregates. */
  def ksDrift(docs: DataFrame): DataFrame = {
    val vals = docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))))
      .select(col("v"), col("cum"))
    val nTot = docs.agg(count(lit(1)).cast("long").as("n"))
    val srcCnt = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("cs"))
    val srcs = docs.groupBy(col("source")).agg(count(lit(1)).cast("long").as("n_s"))
    val grid = srcs.crossJoin(vals).crossJoin(broadcast(nTot))
      .join(srcCnt, Seq("source", "v"), "left")
      .withColumn("cum_s", sum(coalesce(col("cs"), lit(0L))).over(
        Window.partitionBy(col("source")).orderBy(col("v"))))
      .withColumn("num",
        abs(col("cum_s").cast("decimal(38,0)") * col("n").cast("decimal(38,0)")
          - col("cum").cast("decimal(38,0)") * col("n_s").cast("decimal(38,0)")))
    val dmax = grid.groupBy(col("source"), col("n_s"), col("n"))
      .agg(max(col("num")).as("dnum"))
    dmax.join(grid.select(col("source"), col("v"), col("num")),
        Seq("source"))
      .filter(col("num") === col("dnum"))
      .groupBy(col("source"), col("n_s"), col("n"), col("dnum"))
      .agg(min(col("v")).as("at_value"))
      .select(col("source"), col("n_s"),
        (col("dnum").cast("double") /
          (col("n_s").cast("double") * col("n").cast("double"))).as("d_stat"),
        col("at_value"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------ q212

  /** q212's pinned total sample budget and the fixed-point weight scale. */
  private[operators] val NeymanBudget = 1000L
  private val NeymanWScale = 1e6

  /** q212 — Neyman-optimal stratified sample allocation: for a total
    * eval/annotation budget B, stratum h gets n_h ∝ N_h·S_h (count ×
    * population std of token length) — the textbook minimum-variance
    * allocation (Neyman 1934), the principled upgrade over proportional
    * quotas (q63/q161) when strata have very different spreads.
    *
    * Determinism: N_h·S_h = sqrt(N_h·Σx² − (Σx)²) with both moments exact
    * BIGINTs, so the weight is ONE correctly-rounded IEEE sqrt (bit-equal
    * cross-engine), then floored to a fixed-point BIGINT at 1e6 scale;
    * the denominator is an exact integer sum and the final quota is pure
    * integer floor-division — no float summation order anywhere.
    *
    * Scale shape: one scan-local token count, one partial+final per-source
    * moment aggregate (|sources| rows), a broadcast 1-row denominator.
    * Nothing downstream of the scan grows with the corpus. */
  def neymanAlloc(docs: DataFrame, budget: Long = NeymanBudget): DataFrame = {
    require(budget > 0, "budget must be positive")
    val len = size(TextFunctions.tokens(col("text"))).cast("long")
    val m = docs.select(col("source"), len.as("len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("len")).as("s1"),
        sum(col("len") * col("len")).as("s2"))
    val varNum = (col("n") * col("s2") - col("s1") * col("s1")).cast("double")
    val w = m.select(col("source"), col("n"),
      sqrt(varNum).as("ns"),
      floor(sqrt(varNum) * lit(NeymanWScale)).cast("long").as("w"))
    val tot = w.agg(sum(col("w")).as("wt"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n").as("n_docs"),
        (col("ns") / col("n").cast("double")).as("std_tokens"),
        expr(s"CAST(($budget * w) DIV wt AS BIGINT)").as("alloc"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------ q221

  /** q221's pinned replicate count and the Poisson(1) CDF ladder
    * (cumulative P[X <= j], j = 0..6; a weight of 7 absorbs the
    * residual 1e-5 tail mass). One source of truth for the engine
    * expression AND the generated oracle. */
  private[operators] val BootReps = 32
  private[operators] val PoissonCum: Seq[Double] = {
    val inv = math.exp(-1.0)
    (0 to 6).scanLeft(0.0) { case (acc, k) =>
      acc + inv / (1 to k).foldLeft(1.0)(_ * _)
    }.tail
  }

  /** q221 — Poisson bootstrap of the mean document length (Chamandy et
    * al. 2012, "Estimating uncertainty for massive data streams" — the
    * standard one-pass bootstrap at scale): replicate b reweights each
    * doc by an independent Poisson(1) count drawn from the md5 uniform
    * u = h60(doc_id||b)/2^60 through the pinned inverse-CDF ladder
    * [[PoissonCum]], and reports each replicate's weighted mean — the
    * spread of those [[BootReps]] means IS the sampling uncertainty of
    * the corpus statistic, computed without ever materializing a
    * resample. Multinomial bootstrap needs the global n per draw;
    * Poisson(1) factorizes per row, which is what makes it
    * shuffle-free.
    *
    * Determinism: u is the exact md5-uniform (q48/q111 family); the
    * ladder compares u to pinned double literals, so each weight is an
    * exact integer in both engines; Σw and Σw·len are exact BIGINTs;
    * the replicate mean is one terminal division (NULL if a replicate
    * weights out every doc — possible only on toy fixtures).
    *
    * Scale shape: one scan with a [[BootReps]]-way row expansion (the
    * honest cost — B passes' worth of aggregate input, but ZERO extra
    * shuffles: the (b)-keyed aggregate is partial+final over B keys),
    * everything after runs on B rows. */
  def bootstrapMeans(docs: DataFrame, reps: Int = BootReps): DataFrame = {
    require(reps > 0, "replicate count must be positive")
    val len = size(TextFunctions.tokens(col("text"))).cast("long")
    val u = TextFunctions.h60(concat_ws("-", col("doc_id"), col("b")))
      .cast("double") / lit(Pow60)
    val w = PoissonCum.map(t => when(u >= lit(t), 1L).otherwise(0L))
      .reduce(_ + _)
    docs.select(col("doc_id"), len.as("len"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .select(col("b").cast("long").as("b"), col("len"), w.as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("len")).as("wlen"))
      .select(col("b"), col("n_eff"),
        when(col("n_eff") > 0,
          col("wlen").cast("double") / col("n_eff").cast("double"))
          .otherwise(lit(null).cast("double")).as("boot_mean"))
      .orderBy(col("b"))
  }

  // ------------------------------------------------------------------ q222

  /** q222's pinned fold count. */
  private[operators] val KFolds = 5

  /** q222 — stratified k-fold assignment: within each source, docs are
    * ranked by the md5 key and dealt round-robin into [[KFolds]] folds,
    * so every (source, fold) cell is exactly balanced (|n_f − n_g| ≤ 1
    * within a source — the guarantee q111's iid cut cannot give small
    * strata) while membership stays pseudorandom and content-free. The
    * cross-validation counterpart of q63's stratified sample; emits the
    * per-cell counts plus each source's max−min spread as the audit.
    *
    * Determinism: ranks are integers off the md5 order (ties by doc_id,
    * the q81 convention); fold = (rank−1) mod k; counts are exact.
    *
    * Scale shape: ONE per-source window sort (the same shuffle q106
    * already pays — at 100 TB, partitioned by source with skew handled
    * by the source key's cardinality), then a (source, fold) count and
    * a |sources|-key window max/min on the tiny aggregated frame. */
  def stratifiedKFold(docs: DataFrame, k: Int = KFolds): DataFrame = {
    require(k >= 2, "fold count must be at least 2")
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val cells = docs
      .select(col("source"), col("doc_id"))
      .withColumn("fold", ((row_number().over(w) - 1) % k).cast("long"))
      .groupBy(col("source"), col("fold")).agg(count(lit(1)).as("n_docs"))
    val ws = Window.partitionBy(col("source"))
    cells
      .withColumn("source_spread", max(col("n_docs")).over(ws) - min(col("n_docs")).over(ws))
      .orderBy(col("source"), col("fold"))
  }

  /** q262's pinned parameters: hashed-feature bucket count, selection
    * size, and fixed-point scale — shared with the generated oracle. */
  private[operators] val DsirBuckets = 64
  private[operators] val DsirK = 20
  private val DsirScale = 1e9

  /** q262 — DSIR-style importance selection (Xie et al., NeurIPS 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * rank candidate documents by how target-like their hashed-unigram
    * profile is. Features are word unigrams hashed into B=64 buckets
    * (h60 % B — cross-engine exact); the target distribution p comes
    * from the 'en' slice, the proposal q from the candidate pool
    * itself, both with add-½ smoothing; a doc's log-importance is
    * Σ_b count_b·(ln p_b − ln q_b), and the top-K by weight (ties by
    * doc_id) are selected — the deterministic top-k variant of the
    * paper's Gumbel resampling (same ranking statistic; sampling noise
    * has no place in a hash-checked oracle).
    *
    * Determinism: smoothed probabilities use integer-exact arguments
    * (p_b ∝ 2·ct_b + 1 over 2·N_t + B — no fractional literals), each
    * ln is grid9-pinned, the four-ln term is difference-paired like
    * q158 (p == q cancels exactly), and per-doc summation rides
    * floor(term·1e9) in decimal(38,0) — order-free and identical in
    * DuckDB's HUGEINT. The 1e9 scale keeps |term·1e9| < 2^53 for docs
    * up to ~10^5 tokens per bucket, so BOTH engines' floors operate in
    * exact-double range; log_weight = sc/1e9 is one correctly-rounded
    * division of identical integers, making the order (and the
    * K-boundary) bit-identical cross-engine.
    *
    * Scale shape: one token-explode aggregate per side is the only
    * corpus-sized work; both distributions are B-row frames broadcast
    * back; the per-(doc,bucket) frame joins them map-side; the per-doc
    * decimal sum is one partial+final aggregate; and the top-K runs as
    * TakeOrderedAndProject (per-partition heaps, no global sort
    * materialization). Driver state: K rows. At 100 TB the B-bucket
    * side state is constant-size and the candidate scan is the same
    * single pass every hashed-feature scorer in this module pays. */
  def dsirSelection(docs: DataFrame): DataFrame = {
    // ONE corpus pass: explode + hash every token once; the target
    // side's doc identity collapses in the grouping key, so both
    // distributions fall out of the same aggregate and Spark's
    // ReuseExchange runs the scan once for the tb and cb branches
    val counts = docs
      .select(col("doc_id"), col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .select((col("lang") === "en").as("tgt"), col("doc_id"), col("lang"),
        (TextFunctions.h60(col("w")) % DsirBuckets).as("b"))
      .groupBy(col("tgt"),
        when(col("tgt"), lit(-1L)).otherwise(col("doc_id")).as("doc_id"),
        when(col("tgt"), lit("")).otherwise(col("lang")).as("lang"),
        col("b"))
      .agg(count(lit(1)).as("cnt"))
    val tb = counts.filter(col("tgt"))
      .groupBy(col("b")).agg(sum(col("cnt")).as("ct"))
    val ntRow = tb.agg(sum(col("ct")).as("nt"))
    val cb = counts.filter(!col("tgt"))
      .select(col("doc_id"), col("lang"), col("b"), col("cnt"))
    val qb = cb.groupBy(col("b")).agg(sum(col("cnt")).as("cq"))
    val nqRow = qb.agg(sum(col("cq")).as("nq"))
    def lg(c: org.apache.spark.sql.Column) = Pin.grid9(log(c.cast("double")))
    val term = col("cnt").cast("double") *
      ((lg(lit(2L) * coalesce(col("ct"), lit(0L)) + lit(1L)) -
        lg(lit(2L) * col("cq") + lit(1L))) +
       (lg(lit(2L) * col("nq") + lit(DsirBuckets.toLong)) -
        lg(lit(2L) * col("nt") + lit(DsirBuckets.toLong))))
    cb.join(broadcast(tb), Seq("b"), "left")
      .join(broadcast(qb), Seq("b"))
      .crossJoin(broadcast(ntRow)).crossJoin(broadcast(nqRow))
      .select(col("doc_id"), col("lang"), col("cnt"),
        floor(term * lit(DsirScale)).cast("decimal(38,0)").as("t"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("t")).cast("decimal(38,0)").as("sc"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("sc").cast("double") / lit(DsirScale)).as("log_weight"))
      .orderBy(desc("log_weight"), col("doc_id"))
      .limit(DsirK)
  }

  /** q269 — Chao1 vocabulary-richness estimate per source (Chao 1984):
    * how many distinct words a source WOULD show with unbounded
    * sampling — V + f1(f1−1)/(2(f2+1)) from the frequency spectrum's
    * singleton/doubleton counts (the bias-corrected form, defined at
    * f2 = 0). The curation signal beside q175's Heaps growth-curve fit
    * (trajectory) and q228's Good-Turing (unseen probability MASS):
    * a source whose Chao1 far exceeds its observed vocabulary is
    * under-sampled; one whose estimate ≈ V is exhausted.
    *
    * Exactness: integer spectrum counts; the estimate is one mirrored
    * chain of correctly-rounded IEEE ops — bit-identical, no pin.
    * Scale shape: the same single (source, word) count aggregate the
    * q158 family pays, then a |sources|-bounded spectrum rollup. */
  def chao1Richness(docs: DataFrame): DataFrame = {
    val freq = docs
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    freq.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("vocab"), col("f1"), col("f2"),
        (col("vocab").cast("double") +
          col("f1").cast("double") * (col("f1").cast("double") - lit(1.0)) /
            (lit(2.0) * (col("f2").cast("double") + lit(1.0)))).as("chao1"))
      .orderBy(col("source"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q269_chao1" -> ((s, d) => chao1Richness(Tables.documents(s, d))),
    "q262_dsir_selection" -> ((s, d) => dsirSelection(Tables.documents(s, d))),
    "q221_bootstrap_ci" -> ((s, d) => bootstrapMeans(Tables.documents(s, d))),
    "q222_stratified_kfold" -> ((s, d) => stratifiedKFold(Tables.documents(s, d))),
    "q169_hist_quantiles" -> ((s, d) => histQuantiles(Tables.documents(s, d))),
    "q170_ks_drift" -> ((s, d) => ksDrift(Tables.documents(s, d))),
    "q158_kl_divergence" -> ((s, d) => klDivergence(Tables.documents(s, d))),
    "q157_gini" -> ((s, d) => giniConcentration(Tables.documents(s, d))),
    "q154_weighted_reservoir" -> ((s, d) => weightedReservoir(Tables.documents(s, d))),
    "q149_hll_distinct" -> ((s, d) => hllDistinct(Tables.documents(s, d))),
    "q212_neyman_alloc" -> ((s, d) => neymanAlloc(Tables.documents(s, d))),
    "q139_kmv_overlap" -> ((s, d) => kmvOverlap(Tables.documents(s, d))),
    "q144_pps_sample" -> ((s, d) => ppsSample(Tables.documents(s, d))),
    "q137_data_card" -> ((s, d) => dataCard(Tables.documents(s, d))),
    "q129_cms_heavy" -> ((s, d) => cmsHeavyHitters(Tables.documents(s, d))),
    "q110_kmv_distinct" -> ((s, d) => kmvDistinct(Tables.documents(s, d))),
    "q111_train_split" -> ((s, d) => trainSplit(Tables.documents(s, d))),
    "q112_source_overlap" -> ((s, d) => sourceOverlap(Tables.documents(s, d)))
  )

  /** DuckDB h60 twin (TextFunctions.h60 scaladoc contract). */
  private def h60sql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** q137 oracle, generated from the same pinned class list as the engine
    * expression (q131 convention: identical term structure + fold order). */
  private def dataCardOracle(classes: Seq[String]): String = {
    val nCols = classes.map(c =>
      s"sum(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS n_$c").mkString(",\n    ")
    def entTerm(c: String): String =
      s"""CASE WHEN n_$c = 0 THEN 0.0 ELSE
         |    -(CAST(n_$c AS DOUBLE) / nD) *
         |      (floor(ln(CAST(n_$c AS DOUBLE) / nD) * 1.0e9 + 0.5) / 1.0e9) END""".stripMargin
    s"""WITH m AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
       |      AS total_tokens,
       |    sum(n_chars) AS sum_chars,
       |    $nCols
       |  FROM documents GROUP BY source),
       |j AS (SELECT *, CAST(n_docs AS DOUBLE) AS nD FROM m)
       |SELECT source, n_docs, total_tokens,
       |  CAST(sum_chars AS DOUBLE) / nD AS mean_chars,
       |  ${classes.map(entTerm).mkString("\n  + ")} AS lang_entropy,
       |  CAST(greatest(${classes.map(c => s"n_$c").mkString(", ")}) AS DOUBLE) / nD
       |    AS majority_share
       |FROM j ORDER BY source""".stripMargin
  }

  /** q221's DuckDB twin — the CASE ladder is GENERATED from the same
    * [[PoissonCum]] constants the engine expression uses. */
  private def bootstrapOracle: String = {
    val ladder = PoissonCum
      .map(t => s"(CASE WHEN u >= ${Pin.sqlDouble(t)} THEN 1 ELSE 0 END)")
      .mkString("\n      + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS len
       |  FROM documents),
       |r AS (SELECT CAST(unnest(range($BootReps)) AS BIGINT) AS b),
       |u AS (
       |  SELECT d.len, r.b,
       |    ${h60sql("CAST(doc_id AS VARCHAR) || '-' || CAST(b AS VARCHAR)")}
       |      / 1152921504606846976.0 AS u
       |  FROM d CROSS JOIN r),
       |w AS (
       |  SELECT b, len, CAST($ladder AS BIGINT) AS w
       |  FROM u)
       |SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
       |  CASE WHEN sum(w) > 0 THEN
       |    CAST(sum(w * len) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
       |  ELSE NULL END AS boot_mean
       |FROM w GROUP BY b ORDER BY b""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q221_bootstrap_ci" -> bootstrapOracle,
    "q222_stratified_kfold" ->
      s"""WITH f AS (
         |  SELECT source,
         |    (row_number() OVER (PARTITION BY source
         |       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
         |      % $KFolds AS fold
         |  FROM documents),
         |c AS (
         |  SELECT source, CAST(fold AS BIGINT) AS fold,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |  FROM f GROUP BY source, fold)
         |SELECT source, fold, n_docs,
         |  CAST(max(n_docs) OVER (PARTITION BY source)
         |    - min(n_docs) OVER (PARTITION BY source) AS BIGINT) AS source_spread
         |FROM c ORDER BY source, fold""".stripMargin,
    "q212_neyman_alloc" ->
      s"""WITH m AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS s1,
         |    CAST(sum(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         |      * CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT))
         |      AS BIGINT) AS s2
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, n,
         |    sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) AS ns,
         |    CAST(floor(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) * 1.0e6) AS BIGINT) AS w
         |  FROM m),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM w)
         |SELECT source, n AS n_docs,
         |  ns / CAST(n AS DOUBLE) AS std_tokens,
         |  CAST(($NeymanBudget * w) // wt AS BIGINT) AS alloc
         |FROM w CROSS JOIN tot ORDER BY source""".stripMargin,
    // same integer target ranks, bitlength buckets, argmin-bucket and
    // rank-selected exact twin
    "q169_hist_quantiles" ->
      """WITH ns AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT source, n, q, (q * n + 99) // 100 AS target
        |  FROM ns, unnest([50, 90, 99]) AS u(q)),
        |h AS (
        |  SELECT source,
        |    CAST(length(format('{:b}', n_chars)) - 1 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |hc AS (
        |  SELECT source, bucket,
        |    sum(c) OVER (PARTITION BY source ORDER BY bucket) AS cum
        |  FROM h),
        |est AS (
        |  SELECT t.source, t.q, t.target,
        |    CAST(min(hc.bucket) AS BIGINT) AS bucket
        |  FROM t JOIN hc ON hc.source = t.source AND hc.cum >= t.target
        |  GROUP BY t.source, t.q, t.target),
        |r AS (
        |  SELECT source, n_chars, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |SELECT est.source, CAST(est.q AS INT) AS q,
        |  CAST(est.target AS BIGINT) AS target_rank, est.bucket,
        |  CAST(1 AS BIGINT) << CAST(est.bucket AS INT) AS est_lo,
        |  r.n_chars AS exact_value
        |FROM est JOIN r ON r.source = est.source AND r.rn = est.target
        |ORDER BY est.source, q""".stripMargin,
    // same cross-multiplied HUGEINT numerators, smallest witness value
    "q170_ks_drift" ->
      """WITH vals AS (
        |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |vc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vals),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |sc AS (
        |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS cs
        |  FROM documents GROUP BY 1, 2),
        |ss AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |       FROM documents GROUP BY source),
        |grid AS (
        |  SELECT ss.source, ss.n_s, nt.n, vc.v, vc.cum,
        |    sum(coalesce(sc.cs, 0)) OVER (
        |      PARTITION BY ss.source ORDER BY vc.v) AS cum_s
        |  FROM ss CROSS JOIN vc CROSS JOIN nt
        |  LEFT JOIN sc ON sc.source = ss.source AND sc.v = vc.v),
        |num AS (
        |  SELECT source, n_s, n, v,
        |    abs(CAST(cum_s AS HUGEINT) * CAST(n AS HUGEINT)
        |      - CAST(cum AS HUGEINT) * CAST(n_s AS HUGEINT)) AS num
        |  FROM grid),
        |d AS (SELECT source, n_s, n, max(num) AS dnum
        |      FROM num GROUP BY source, n_s, n)
        |SELECT d.source, d.n_s,
        |  CAST(d.dnum AS DOUBLE) / (CAST(d.n_s AS DOUBLE) * CAST(d.n AS DOUBLE))
        |    AS d_stat,
        |  min(num.v) AS at_value
        |FROM d JOIN num ON num.source = d.source AND num.num = d.dnum
        |GROUP BY d.source, d.n_s, d.dnum, d.n
        |ORDER BY d.source""".stripMargin,
    // integer spectrum counts, one mirrored IEEE chain — no pin needed
    "q269_chao1" ->
      """WITH freq AS (
        |  SELECT source, tk.w AS w, CAST(count(*) AS BIGINT) AS c
        |  FROM documents,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) tk(w)
        |  GROUP BY source, tk.w),
        |spec AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM freq GROUP BY source)
        |SELECT source, vocab, f1, f2,
        |  CAST(vocab AS DOUBLE) +
        |    CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0) /
        |      (2.0 * (CAST(f2 AS DOUBLE) + 1.0)) AS chao1
        |FROM spec ORDER BY source""".stripMargin,
    // same pinned four-ln difference-paired term dag, same fixed-point
    // floor(·1e9) HUGEINT summation; the h60 % 64 bucketing is the
    // md5-prefix hash both engines compute identically
    "q262_dsir_selection" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(tk.w), 1, 15)) AS BIGINT) % 64 AS b
        |  FROM documents,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) tk(w)),
        |tb AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS ct
        |  FROM tok WHERE lang = 'en' GROUP BY b),
        |nt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tb),
        |cb AS (
        |  SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok WHERE lang <> 'en' GROUP BY doc_id, lang, b),
        |qb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cq FROM cb GROUP BY b),
        |nq AS (SELECT CAST(sum(cq) AS BIGINT) AS nq FROM qb),
        |sums AS (
        |  SELECT cb.doc_id, cb.lang,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    sum(CAST(floor(CAST(cnt AS DOUBLE) * (
        |      (floor(ln(CAST(2 * COALESCE(tb.ct, 0) + 1 AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9
        |       - floor(ln(CAST(2 * qb.cq + 1 AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
        |      + (floor(ln(CAST(2 * nq.nq + 64 AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9
        |         - floor(ln(CAST(2 * nt.nt + 64 AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
        |    ) * 1.0e9) AS HUGEINT)) AS sc
        |  FROM cb
        |  LEFT JOIN tb USING (b)
        |  JOIN qb USING (b)
        |  CROSS JOIN nt CROSS JOIN nq
        |  GROUP BY cb.doc_id, cb.lang)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(sc AS DOUBLE) / 1.0e9 AS log_weight
        |FROM sums
        |ORDER BY log_weight DESC, doc_id
        |LIMIT 20""".stripMargin,
    // same pinned term dag (p·((ln c_s − ln c) + (ln N − ln n_s))), same
    // fixed-point floor(·1e15) HUGEINT summation — order-free both sides
    "q158_kl_divergence" ->
      """WITH t AS (
        |  SELECT source, tk.w AS w
        |  FROM documents,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) tk(w)),
        |cs AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c_s
        |  FROM t GROUP BY source, w),
        |corpus AS (SELECT w, CAST(sum(c_s) AS BIGINT) AS c FROM cs GROUP BY w),
        |ns AS (
        |  SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s,
        |    CAST(count(*) AS BIGINT) AS vocab_s
        |  FROM cs GROUP BY source),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM corpus),
        |sums AS (
        |  SELECT cs.source,
        |    sum(CAST(floor(
        |      (CAST(cs.c_s AS DOUBLE) / CAST(ns.n_s AS DOUBLE)) *
        |        ((floor(ln(CAST(cs.c_s AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9
        |          - floor(ln(CAST(corpus.c AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
        |          + (floor(ln(CAST(nn.n AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9
        |            - floor(ln(CAST(ns.n_s AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9))
        |      * 1.0e15) AS HUGEINT)) AS sc
        |  FROM cs
        |  JOIN corpus USING (w)
        |  JOIN ns ON ns.source = cs.source
        |  CROSS JOIN nn
        |  GROUP BY cs.source)
        |SELECT s.source, ns.n_s AS n_tokens, ns.vocab_s AS vocab_size,
        |  CAST(s.sc AS DOUBLE) / 1.0e15 AS kl
        |FROM sums s JOIN ns ON ns.source = s.source
        |ORDER BY s.source""".stripMargin,
    // same rank convention (ties by doc_id), HUGEINT moment sums, one
    // double division
    "q157_gini" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS r
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |    sum(CAST(r AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS srx
        |  FROM r GROUP BY source)
        |SELECT source, n_docs, sum_chars,
        |  CAST(2 * srx - CAST(n_docs + 1 AS HUGEINT) * CAST(sum_chars AS HUGEINT)
        |    AS DOUBLE)
        |    / CAST(CAST(n_docs AS HUGEINT) * CAST(sum_chars AS HUGEINT) AS DOUBLE)
        |    AS gini
        |FROM a ORDER BY source""".stripMargin,
    // same ln(u)/w ranking key (monotone twin of the E-S u^(1/w) key)
    "q154_weighted_reservoir" ->
      s"""SELECT doc_id, source, n_chars,
         |  (floor(ln(${h60sql("CAST(doc_id AS VARCHAR)")} / $Pow60Dec.0)
         |    * 1.0e9 + 0.5) / 1.0e9)
         |    / CAST(n_chars AS DOUBLE) AS ln_key
         |FROM documents
         |WHERE n_chars > 0
         |ORDER BY ln_key DESC, doc_id LIMIT $ResK""".stripMargin,
    // same bit conventions: bucket = h60 >> 52, rho = 53 − bitlength(rem)
    // via binary-string length (integer-exact), scaled harmonic sum in
    // HUGEINT, one final double division with the identical operand chain
    "q149_hll_distinct" -> {
      val m = 1 << HllP
      val remBits = 60 - HllP
      val mask = (1L << remBits) - 1
      val scale = 1L << (remBits + 1)
      s"""WITH h AS (
         |  SELECT source, ${h60sql("text")} AS h FROM documents),
         |b AS (
         |  SELECT source, h >> $remBits AS bucket,
         |    CASE WHEN (h & $mask) = 0 THEN ${remBits + 1}
         |         ELSE ${remBits + 1} - length(format('{:b}', h & $mask))
         |    END AS r
         |  FROM h),
         |mb AS (
         |  SELECT source, bucket, max(r) AS mr FROM b GROUP BY source, bucket),
         |ps AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS buckets_used,
         |    CAST(sum(CAST(1 AS BIGINT) << (${remBits + 1} - mr)) AS BIGINT) AS s_used
         |  FROM mb GROUP BY source),
         |ex AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
         |  FROM h GROUP BY source),
         |j AS (
         |  SELECT ps.source, ex.n_docs, ex.n_distinct, ps.buckets_used,
         |    (0.7213 / (1.0 + 1.079 / $m.0)) * $m.0 * $m.0 * $scale.0
         |      / CAST(ps.s_used + ($m - ps.buckets_used) * $scale AS DOUBLE)
         |      AS raw
         |  FROM ps JOIN ex USING (source))
         |SELECT source, n_docs, n_distinct, buckets_used,
         |  CASE WHEN raw <= ${2.5 * m} AND buckets_used < $m
         |    THEN $m.0 * (floor(ln($m.0 / CAST($m - buckets_used AS DOUBLE))
         |      * 1.0e9 + 0.5) / 1.0e9)
         |    ELSE raw END AS hll_est
         |FROM j
         |ORDER BY source""".stripMargin
    },
    "q137_data_card" -> dataCardOracle(Classify.MiClasses),
    "q129_cms_heavy" ->
      s"""WITH w AS (
        |  SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
        |occ AS (
        |  SELECT t.tok AS token, CAST(count(*) AS BIGINT) AS n
        |  FROM w, unnest(ws) t(tok) GROUP BY 1),
        |probes AS (SELECT token, n AS exact_n FROM occ ORDER BY n DESC, token LIMIT $CmsTopK),
        |rr AS (SELECT CAST(x AS INT) AS r FROM range($CmsDepth) t(x)),
        |bk AS (
        |  SELECT o.token, rr.r,
        |    ${h60sql("CAST(rr.r AS VARCHAR) || '-' || o.token")} % $CmsWidth AS b, o.n
        |  FROM occ o CROSS JOIN rr),
        |pb AS (
        |  SELECT p.token, p.exact_n, rr.r,
        |    ${h60sql("CAST(rr.r AS VARCHAR) || '-' || p.token")} % $CmsWidth AS b
        |  FROM probes p CROSS JOIN rr),
        |cells AS (
        |  SELECT pb.token, pb.exact_n, pb.r, sum(bk.n) AS cell
        |  FROM pb JOIN bk ON bk.r = pb.r AND bk.b = pb.b
        |  GROUP BY 1, 2, 3)
        |SELECT token, exact_n, CAST(min(cell) AS BIGINT) AS cms_est,
        |  CAST(min(cell) - exact_n AS BIGINT) AS overcount
        |FROM cells GROUP BY token, exact_n
        |ORDER BY exact_n DESC, token""".stripMargin,
    "q110_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT source, ${h60sql("text")} AS h FROM documents),
         |d AS (SELECT DISTINCT source, h FROM h),
         |r AS (
         |  SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM d),
         |sk AS (
         |  SELECT source, CAST(count(*) AS INT) AS sketch_size,
         |    max(CASE WHEN rn = $KmvK THEN h END) AS kth
         |  FROM r WHERE rn <= $KmvK GROUP BY source),
         |n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
         |SELECT n.source, n.n_docs, sk.sketch_size,
         |  CASE WHEN sk.sketch_size < $KmvK THEN CAST(sk.sketch_size AS DOUBLE)
         |       ELSE CAST(${KmvK - 1} AS DOUBLE)
         |         / (CAST(sk.kth AS DOUBLE) / 1152921504606846976.0)
         |  END AS est_distinct
         |FROM n JOIN sk USING (source)
         |ORDER BY n.source""".stripMargin,
    "q111_train_split" ->
      s"""SELECT doc_id, source,
         |  CASE
         |    WHEN ${h60sql("CAST(doc_id AS VARCHAR)")} / 1152921504606846976.0
         |      < ${1.0 - ValFrac - TestFrac} THEN 'train'
         |    WHEN ${h60sql("CAST(doc_id AS VARCHAR)")} / 1152921504606846976.0
         |      < ${1.0 - TestFrac} THEN 'val'
         |    ELSE 'test'
         |  END AS split
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "q144_pps_sample" ->
      s"""WITH tot AS (
         |  SELECT CAST(sum(n_chars) AS HUGEINT) AS w FROM documents)
         |SELECT doc_id, source, n_chars,
         |  least(1.0, ($PpsTarget.0 * CAST(n_chars AS DOUBLE)) / CAST(w AS DOUBLE))
         |    AS p_include,
         |  1.0 / least(1.0, ($PpsTarget.0 * CAST(n_chars AS DOUBLE)) / CAST(w AS DOUBLE))
         |    AS ht_weight
         |FROM documents, tot
         |WHERE CAST(${h60sql("CAST(doc_id AS VARCHAR)")} AS HUGEINT) * w
         |  < CAST($PpsTarget AS HUGEINT) * CAST(n_chars AS HUGEINT)
         |    * CAST($Pow60Dec AS HUGEINT)
         |ORDER BY doc_id""".stripMargin,
    "q139_kmv_overlap" ->
      s"""WITH w AS (
         |  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT DISTINCT source,
         |    ${h60sql(s"list_aggregate(ws[CAST(r.i AS INT) + 1 : CAST(r.i AS INT) + $OverlapN], 'string_agg', ' ')")} AS h
         |  FROM w, unnest(range(0, len(ws) - ${OverlapN - 1})) AS r(i)),
         |rk AS (
         |  SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM g),
         |sk AS (SELECT source, h FROM rk WHERE rn <= $KmvK),
         |pr AS (
         |  SELECT a.source AS sa, b.source AS sb
         |  FROM (SELECT DISTINCT source FROM sk) a
         |  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
         |u AS (
         |  SELECT pr.sa, pr.sb, s.h, CAST(count(*) AS INT) AS sides
         |  FROM pr JOIN sk s ON s.source = pr.sa OR s.source = pr.sb
         |  GROUP BY 1, 2, 3),
         |ru AS (
         |  SELECT sa, sb, h, sides,
         |    row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
         |  FROM u),
         |agg AS (
         |  SELECT sa, sb, CAST(count(*) AS INT) AS k_used,
         |    CAST(count(*) FILTER (sides = 2) AS INT) AS shared_in_sketch,
         |    max(CASE WHEN rn = $KmvK THEN h END) AS kth
         |  FROM ru WHERE rn <= $KmvK GROUP BY 1, 2)
         |SELECT sa AS source_a, sb AS source_b, k_used, shared_in_sketch,
         |  CASE WHEN k_used < $KmvK THEN CAST(k_used AS DOUBLE)
         |       ELSE ${KmvK - 1}.0 / (CAST(kth AS DOUBLE) / 1152921504606846976.0)
         |  END AS est_union,
         |  CAST(shared_in_sketch AS DOUBLE) / CAST(k_used AS DOUBLE) AS est_jaccard,
         |  (CAST(shared_in_sketch AS DOUBLE) / CAST(k_used AS DOUBLE)) *
         |    (CASE WHEN k_used < $KmvK THEN CAST(k_used AS DOUBLE)
         |          ELSE ${KmvK - 1}.0 / (CAST(kth AS DOUBLE) / 1152921504606846976.0)
         |     END) AS est_shared
         |FROM agg
         |ORDER BY source_a, source_b""".stripMargin,
    "q112_source_overlap" ->
      s"""WITH w AS (
         |  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT DISTINCT source,
         |    ${h60sql(s"list_aggregate(ws[CAST(r.i AS INT) + 1 : CAST(r.i AS INT) + $OverlapN], 'string_agg', ' ')")} AS g
         |  FROM w, unnest(range(0, len(ws) - ${OverlapN - 1})) AS r(i)),
         |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY source),
         |s AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS shared_grams
         |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT s.source_a, s.source_b, s.shared_grams, ca.n_grams AS n_a,
         |  cb.n_grams AS n_b,
         |  CAST(s.shared_grams AS DOUBLE)
         |    / CAST(ca.n_grams + cb.n_grams - s.shared_grams AS DOUBLE) AS jaccard
         |FROM s JOIN c ca ON ca.source = s.source_a
         |JOIN c cb ON cb.source = s.source_b
         |ORDER BY s.source_a, s.source_b""".stripMargin
  )
}
