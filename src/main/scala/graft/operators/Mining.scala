package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{CacheScope, Tables}
import graft.functions.{Pin, TextFunctions, VectorFunctions}

/** Corpus-mining operators on top of the dedup/similarity kernels: the steps
  * that turn raw documents + embeddings into a curated training set —
  * canonical-document selection after near-dup clustering, TF-IDF term
  * weighting, compressed-index ANN with full-precision re-ranking, and a
  * bigram language model.
  *
  * Same determinism discipline as the rest of the engine: integer counts,
  * quantized vectors, explicit tie-breaks in every rank, so every operator
  * has a full DuckDB oracle.
  */
object Mining {

  // q69 — canonical-document selection: the final step of the dedup
  // pipeline. Near-dup clusters (q21 pairs → q49 components) collapse to
  // their minimum-doc_id representative; the output is the SURVIVING corpus
  // with the number of removed duplicates carried on each canonical doc.
  // At 100 TB: pairs are sparse (prefix-filtered join), components tiny
  // (union-find under the adaptive cutoff), and the survivor anti-join
  // broadcasts the removed-id set against the corpus scan while it fits —
  // no forced hint: the dup set is duplicate-count-proportional, so the
  // size threshold decides, and a heavily-duplicated corpus demotes to a
  // shuffled semi/anti join instead of an OOM.
  def q69DedupCanonical(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val cc = Dedup.connectedComponents(Dedup.jaccardPairs(docs))
    val removed = cc.filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
    val clusterSz = cc.groupBy(col("cluster_id"))
      .agg((count(lit(1)) - lit(1L)).as("n_dups_removed"))
      .withColumnRenamed("cluster_id", "doc_id")
    docs.join(removed, Seq("doc_id"), "left_anti")
      .join(clusterSz, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        coalesce(col("n_dups_removed"), lit(0L)).as("n_dups_removed"))
      .orderBy(col("doc_id"))
  }

  // q70 — TF-IDF top terms per document (tf * ln(N/df), ties by term): the
  // classic term-weighting pass. One token explode → (doc,term) counts →
  // document frequencies (broadcast: |vocab| << |corpus|) → bounded window.
  // At scale the only big shuffle is the (doc_id, term) partial+final
  // count; df and N are second-order aggregates of that result.
  def q70Tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
    // persist: df is a second-order aggregate OF tf — without materializing,
    // Catalyst re-executes the corpus scan + (doc,term) shuffle for each
    // consumer (no DAG sharing across sibling subtrees)
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")).persist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(dfreq), Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * Pin.grid9(
          log(col("n_docs").cast("double") / col("df").cast("double"))))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  // q72 — two-stage ANN: int8-quantized shortlist + full-precision re-rank,
  // the standard compressed-index retrieval shape (a 4x-smaller index scans
  // the corpus; only `shortlist` candidates per query touch the float32
  // vectors). Quantization is q68's max-abs int8 (round(x*127/max|x|)) —
  // integer-valued, so quantized dot products are exact and the approximate
  // score is bit-deterministic. At 100 TB stage 1 reads ONLY the quantized
  // column (columnar pruning pays the 4x), stage 2 re-reads full vectors
  // for |queries| x shortlist rows.
  def q72AnnRerank(s: SparkSession, dir: String, queryMaxId: Long = 10,
                   shortlist: Int = 30, k: Int = 10): DataFrame = {
    VectorFunctions.register(s)
    def quantized(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val maxAbs = array_max(transform(emb, x => abs(x.cast("double"))))
      val scale = when(maxAbs === 0.0, lit(0.0)).otherwise(lit(127.0) / maxAbs)
      transform(emb, x => round(x.cast("double") * scale).cast("double"))
    }
    val c = Tables.embeddings(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        quantized(col("embedding")).as("n_q"))
    val q = Tables.embeddings(s, dir).filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        quantized(col("embedding")).as("q_q"))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc_nulls_last, col("neighbor_id"))
    val shortlisted = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", VectorFunctions.cosineSim(col("q_q"), col("n_q")))
      .withColumn("arank", row_number().over(w1))
      .filter(col("arank") <= shortlist)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id"))
    shortlisted
      .withColumn("cosine", VectorFunctions.cosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w2).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // q80 — bigram language model: P(w2|w1) over the corpus, top-50 bigrams.
  // Bigram assembly is SCAN-LOCAL via the native WordNgramList expression
  // (all token 2-grams, with multiplicity, one tight loop per row) — the
  // earlier posexplode + per-doc lead() window formulation paid a full
  // doc_id shuffle + sort just to pair adjacent tokens that already sit
  // adjacent in the row. First shuffle is now the (w1,w2) count itself
  // (partial+final). Tokens are \s+-split so splitting the gram on its
  // single space is exact; counts and ranking unchanged.
  /** q148's pinned parameters — shared by the default AND the oracle. */
  private[operators] val PmiMinCount = 5L
  private[operators] val PmiTopN = 50

  /** q148 — PMI collocation mining over adjacent word bigrams (Church &
    * Hanks, CL 1990 — public): PMI(w1,w2) = ln p(w1w2) − ln p(w1) − ln
    * p(w2), the standard "these words belong together" signal behind
    * phrase vocabularies and tokenizer merge seeding. Ranked top-`topN`
    * above a min-count floor (PMI without a floor surfaces hapax noise).
    *
    * Determinism: the PMI double is a FIXED left-to-right chain of ln
    * terms on integer counts — ((((ln n12 + ln T) + ln T) − ln B) −
    * ln n1) − ln n2 — the q131 convention (Spark's Log = StrictMath.log
    * matches DuckDB's libm ln bit-for-bit on these inputs, spec-pinned
    * there); no products of counts are formed, so nothing rides double
    * exactness bounds at any corpus size. Ties order by (w1, w2).
    *
    * Scale shape: bigram expansion is scan-local (`WordNgramList`, the
    * q80/q105 native expression); the bigram and unigram counts are
    * partial+final aggregates on their keys; the unigram frame joins back
    * twice vocab-keyed (AQE broadcasts while it fits); the two 1-row
    * totals broadcast. Top-N plans as TakeOrderedAndProject. */
  def q148Pmi(s: SparkSession, dir: String, minCount: Long = PmiMinCount,
              topN: Int = PmiTopN): DataFrame = {
    VectorFunctions.register(s)
    val docs = Tables.documents(s, dir)
    val uni = docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val big = docs
      .select(explode(VectorFunctions.wordNgramList(col("text"), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minCount)
    val totU = uni.agg(sum(col("n")).cast("double").as("t"))
    val totB = docs.select(greatest(
        size(TextFunctions.tokens(col("text"))) - 1, lit(0)).cast("long").as("nb"))
      .agg(sum(col("nb")).cast("double").as("b"))
    big
      .join(uni.select(col("w").as("w1"), col("n").as("n1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n2")), Seq("w2"))
      .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
      .select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"),
        (Pin.grid9(log(col("n12").cast("double"))) + Pin.grid9(log(col("t")))
          + Pin.grid9(log(col("t")))
          - Pin.grid9(log(col("b"))) - Pin.grid9(log(col("n1").cast("double")))
          - Pin.grid9(log(col("n2").cast("double")))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  def q80Bigrams(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val big = Tables.documents(s, dir)
      .select(explode(VectorFunctions.wordNgramList(col("text"), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val cnt = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("w1")).agg(sum(col("n")).as("n_w1"))
    cnt.join(broadcast(tot), Seq("w1"))
      .withColumn("p", col("n").cast("double") / col("n_w1").cast("double"))
      .select(col("w1"), col("w2"), col("n"), col("n_w1"), col("p"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(50)
  }

  // q81 — deterministic per-group (stratified, fixed-n) sampling: the top-20
  // docs per language by content-independent md5 rank — a reproducible
  // "random" n-per-stratum subset for eval-set carving. Spark 4 plans the
  // rank as WindowGroupLimit: each partition keeps <=n rows per group BEFORE
  // the shuffle, so at 100 TB the exchange carries ~n x |groups| x
  // |partitions| rows, not the corpus.
  def q81GroupSample(s: SparkSession, dir: String, n: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("sample_key"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("sample_key"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= n)
      .select(col("doc_id"), col("lang"), col("rnk"))
      .orderBy(col("lang"), col("rnk"))
  }

  // q82 — CDC snapshot diff: orders before/after a date cutoff keyed by
  // custkey (per-customer order count + revenue), classified added /
  // removed / changed. The full-outer join on the aggregate keys is the
  // standard snapshot-compare plan; at scale both sides partial-aggregate
  // before one co-partitioned shuffle.
  def q82CdcDiff(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-01-01").cast("timestamp")
    val orders = Tables.orders(s, dir)
    def snap(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(30,6)")).as("rev"))
    val a = snap(orders.filter(col("o_orderdate") < cutoff))
      .select(col("o_custkey"), col("n").as("n_old"), col("rev").as("rev_old"))
    val b = snap(orders)
      .select(col("o_custkey"), col("n").as("n_new"), col("rev").as("rev_new"))
    a.join(b, Seq("o_custkey"), "full_outer")
      .withColumn("change_type",
        when(col("n_old").isNull, lit("added"))
          .when(col("n_new").isNull, lit("removed"))
          .when(col("n_old") =!= col("n_new") || col("rev_old") =!= col("rev_new"),
            lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(col("o_custkey"), col("change_type"),
        col("n_old"), col("n_new"),
        col("rev_old").cast("double").as("rev_old"),
        col("rev_new").cast("double").as("rev_new"))
      .orderBy(col("o_custkey"))
  }

  // q85 — kNN classification: label each query vector by majority vote of
  // its exact top-k neighbors' labels (ties → smaller label). The vote is
  // a count over the k-row-per-query top-k — the classify step is O(k) per
  // query once retrieval (brute here; IVF/LSH at scale) hands back the
  // neighbor set.
  def q85KnnClassify(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val topk = Similarity.bruteForceTopK(s, Tables.embeddings(s, dir), k = k)
    val labels = Tables.embeddings(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("label"))
    // broadcast the |queries|*k top-k set, NOT the corpus-sized label table
    // — the labeled corpus grows with SF; the retrieved neighbor set is
    // bounded by the query batch
    val votes = broadcast(topk).join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
      .orderBy(col("query_id"))
  }

  // --------------------------------------------------------------------- //

  /** q145's pinned support threshold — shared by the default AND the
    * generated oracle. */
  private[operators] val TripleMinSup = 3L

  /** q145 — Apriori frequent 3-itemsets over customer baskets (the parts a
    * customer has ever ordered): which part TRIPLES co-occur in ≥ minSup
    * baskets. Pairs are q99's co-purchase; triples are where naive
    * enumeration explodes (a 90-item basket holds 117k triples) and the
    * Apriori property — every subset of a frequent set is frequent — is
    * the classic fix (Agrawal & Srikant, VLDB 1994, public).
    *
    * Plan, stage by stage (downward-closure pruning, never C(n,3)):
    *   1. frequent pairs: basket pair expansion (quadratic in BASKET size
    *      only) → one partial+final count, HAVING ≥ minSup.
    *   2. candidates: frequent pairs self-joined on the shared FIRST item
    *      ((a,b)+(a,c), b<c) then semi-joined against the pair set on
    *      (b,c) — full Apriori pruning, all three sub-pairs frequent.
    *   3. support: pair INSTANCES of frequent (a,b) (semi-join keeps the
    *      expansion to frequent pairs) joined to candidates, then one
    *      (basket, c)-keyed semi...-shaped join against the posting list
    *      confirms c ∈ basket; count per triple, HAVING ≥ minSup.
    *
    * Scale shape: every join is key-shuffled (basket or item keys — the
    * frequent-pair and candidate frames are tiny and AQE broadcasts
    * them); nothing driver-side; no stage materializes unpruned triples.
    * Skew: a hub item's posting list fans out in stage 3 — bounded by
    * sup(a,b) ≤ basket count of the RAREST sub-pair, which minSup keeps
    * meaningful. */
  def aprioriTriples(s: SparkSession, lineitem: DataFrame, orders: DataFrame,
                     minSup: Long = TripleMinSup): DataFrame = {
    val d = graft.core.CacheScope.cached(
      lineitem.join(orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("k"), col("l_partkey").as("p"))
        .distinct())
    val baskets = d.groupBy(col("k")).agg(sort_array(collect_set(col("p"))).as("ps"))
    // cached: the expansion feeds BOTH the frequent-pair count and the
    // stage-3 instance scan — uncached it re-runs the basket explode twice
    val pairInst = graft.core.CacheScope.cached(baskets
      .select(col("k"), explode(col("ps")).as("pa"), col("ps"))
      .select(col("k"), col("pa"), explode(col("ps")).as("pb"))
      .filter(col("pa") < col("pb")))
    val freqPairs = graft.core.CacheScope.cached(
      pairInst.groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= minSup)
        .select(col("pa"), col("pb")))
    val cand = freqPairs.as("x")
      .join(freqPairs.as("y"), col("x.pa") === col("y.pa") && col("x.pb") < col("y.pb"))
      .select(col("x.pa").as("a"), col("x.pb").as("b"), col("y.pb").as("c"))
      .join(freqPairs.select(col("pa").as("b"), col("pb").as("c")), Seq("b", "c"),
        "left_semi")
    val abInst = pairInst
      .join(freqPairs, Seq("pa", "pb"), "left_semi")
      .select(col("k"), col("pa").as("a"), col("pb").as("b"))
    cand.join(abInst, Seq("a", "b"))
      .join(d.select(col("k"), col("p").as("c")), Seq("k", "c"), "left_semi")
      .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
      .orderBy(col("a"), col("b"), col("c"))
  }

  // ------------------------------------------------------------------ q196

  /** Top-K neighbors kept per item in the q196 similarity table. */
  private[operators] val ItemSimK = 3

  /** q196 — item-item cosine similarity over the order/part co-purchase
    * bipartite graph: the classic item-based collaborative-filtering
    * table (Sarwar et al., WWW 2001). sim(a,b) = |orders(a) ∩ orders(b)|
    * / √(|orders(a)|·|orders(b)|) — cosine on binary incidence vectors,
    * so every input to the terminal double chain is an exact integer
    * (co-occurrence and degree counts). Top-[[ItemSimK]] per item, ties
    * broken by higher co-count then lower neighbor id.
    *
    * Scale shape: the pair expansion is Σ_orders |basket|² — bounded by
    * the basket-size cap of the schema (TPC-H ≤ 7 lines/order; for
    * power-law baskets, cap or df-filter upstream exactly as q21's
    * prefix filter does). Degrees join back on the item key (AQE
    * broadcasts the |parts|-sized side while it fits); the top-K is an
    * item-partitioned window — no global sort anywhere. Output is
    * ≤ 2·K·|items| rows. */
  def itemSim(s: SparkSession, lineitem: DataFrame, k: Int = ItemSimK): DataFrame = {
    val op = graft.core.CacheScope.cached(
      lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
    val deg = op.groupBy(col("pk")).agg(count(lit(1)).as("deg"))
    val cooc = op.as("a").join(op.as("b"), col("a.ok") === col("b.ok") &&
        col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_co"))
    val both = cooc.select(col("pa").as("item"), col("pb").as("neighbor"), col("n_co"))
      .unionAll(cooc.select(col("pb").as("item"), col("pa").as("neighbor"), col("n_co")))
    val sims = both
      .join(deg.select(col("pk").as("item"), col("deg").as("deg_i")), Seq("item"))
      .join(deg.select(col("pk").as("neighbor"), col("deg").as("deg_n")), Seq("neighbor"))
      .select(col("item"), col("neighbor"), col("n_co"),
        (col("n_co").cast("double") /
          sqrt((col("deg_i") * col("deg_n")).cast("double"))).as("cosine"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("n_co").desc, col("neighbor"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("item"), col("rk"))
  }

  // ------------------------------------------------------------------ q204

  /** q204 pinned parameters: negatives drawn per positive pair, and the
    * weight-space bucket count for the equi-joinable inverse-CDF lookup. */
  private[operators] val NegPerPos = 2
  private[operators] val NegBuckets = 1024L
  private val Pow60d = 1152921504606846976.0 // 2^60, exact in double

  /** q204 — popularity-smoothed negative sampling for contrastive /
    * two-tower training: for every positive (order, part) pair, draw
    * [[NegPerPos]] negatives from the unigram^0.75 item distribution
    * (the word2vec smoothing, Mikolov et al. 2013) via a DETERMINISTIC
    * md5-coin inverse-CDF lookup — the training-pair construction step
    * a recommender/retrieval pipeline runs at full corpus scale.
    * Accidental hits (negative == the pair's own positive) are FLAGGED,
    * not resampled — resampling loops are nondeterministic under
    * retraction; downstream drops or re-weights flagged rows.
    *
    * Exactness: weights floor(pop^0.75·1e9) are integers off the pinned
    * exp/ln chain; the CDF is an integer cumulative sum over the item
    * dimension (pk order); the coin u = h60(ok-pk-slot)/2^60 is an exact
    * power-of-two division, the target ⌊u·W⌋ one pinned IEEE product
    * (clamped to W−1 against the u→1 rounding edge so no draw can fall
    * off the table).
    *
    * Scale shape: the cumulative window runs over the ITEM DIMENSION
    * (never the fact table); lookups bucketize weight space into
    * [[NegBuckets]] equi-joinable cells (the q150 rewrite — OSS Spark
    * would otherwise BNLJ the range predicate), so the probe is one
    * hash join of 2·|positives| targets against |items|+spans block
    * rows plus a residual filter. */
  def negSample(s: SparkSession, lineitem: DataFrame,
                negPerPos: Int = NegPerPos): DataFrame = {
    import s.implicits._
    val op = graft.core.CacheScope.cached(
      lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
    val deg = op.groupBy(col("pk")).agg(count(lit(1)).as("pop"))
    val wParts = deg.select(col("pk"),
      floor(Pin.grid6(exp(lit(0.75) *
          Pin.grid9(log(col("pop").cast("double"))))) * lit(1e9))
        .cast("long").as("wq"))
    val wWin = Window.orderBy(col("pk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = wParts
      .withColumn("hi", sum(col("wq")).over(wWin))
      .withColumn("lo", col("hi") - col("wq"))
    val tw = cum.agg(max(col("hi")).as("w_tot"))
      .withColumn("width", greatest(lit(1L), expr(s"w_tot DIV $NegBuckets")))
    val blocks = cum.crossJoin(broadcast(tw))
      .select(col("pk").as("neg_pk"), col("lo"), col("hi"),
        explode(sequence(expr("lo DIV width"), expr("(hi - 1) DIV width")))
          .as("bucket"))
    val slots = (0 until negPerPos).map(_.toLong).toDF("slot")
    val u = TextFunctions.h60(
      concat_ws("-", col("ok"), col("pk"), col("slot"))).cast("double") / lit(Pow60d)
    val targets = op.crossJoin(broadcast(slots)).crossJoin(broadcast(tw))
      .withColumn("t", least(col("w_tot") - 1,
        floor(u * col("w_tot").cast("double")).cast("long")))
      .withColumn("bucket", expr("t DIV width"))
    targets.join(blocks, Seq("bucket"))
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select(col("ok").as("l_orderkey"), col("pk").as("l_partkey"), col("slot"),
        col("neg_pk").as("neg_partkey"),
        (col("neg_pk") === col("pk")).as("is_collision"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("slot"))
  }

  // ------------------------------------------------- q218 Kneser-Ney LM

  /** q218's pinned absolute discount and result size. */
  private[operators] val KnDiscount = 0.75
  private[operators] val KnTopN = 30

  /** q218 — interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    * 1995; Chen & Goodman 1999), the production upgrade over q80's
    * raw MLE and q92's unsmoothed LM score:
    *
    *   P_KN(w2|w1) = (c(w1,w2) − D)/c(w1·)
    *               + D·N₁₊(w1,·)/c(w1·) · N₁₊(·,w2)/T
    *
    * with D = [[KnDiscount]], N₁₊(w1,·) = distinct continuations of w1,
    * N₁₊(·,w2) = distinct contexts preceding w2 (the CONTINUATION
    * unigram — "how novel-context-friendly is w2", KN's key idea), and
    * T = total bigram types. Emits the top-[[KnTopN]] bigrams by raw
    * count with MLE and KN probabilities side by side.
    *
    * Determinism: every count is an exact integer (observed c ≥ 1 > D,
    * so the discounted term stays positive without a max-guard); the
    * probability is ONE pinned IEEE chain written identically in both
    * engines (left-to-right: (c−D)/c₁ + D·n_post/c₁·(n_pre/T)); the
    * top-N boundary sorts on the INTEGER count (ties by bigram).
    *
    * Scale shape: scan-local bigram assembly (`WordNgramList`, the
    * q80/q148 expression); one (w1,w2) partial+final count; the three
    * marginals are re-aggregations of that vocab²-bounded frame (each
    * partial+final on w1 or w2); the 1-row type total broadcasts. No
    * corpus-sized shuffle beyond the bigram count q80 already pays. */
  def kneserNey(s: SparkSession, docs: DataFrame, discount: Double = KnDiscount,
                topN: Int = KnTopN): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount must be in (0,1)")
    VectorFunctions.register(s)
    val cnt = CacheScope.cached(docs
      .select(explode(VectorFunctions.wordNgramList(col("text"), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c")))
    val ctx = cnt.groupBy(col("w1"))
      .agg(sum(col("c")).as("c_w1"), count(lit(1)).as("n_post"))
    val cont = cnt.groupBy(col("w2")).agg(count(lit(1)).as("n_pre"))
    val types = cnt.agg(count(lit(1)).as("t"))
    val d = lit(discount)
    val pKn = (col("c").cast("double") - d) / col("c_w1").cast("double") +
      d * col("n_post").cast("double") / col("c_w1").cast("double") *
        (col("n_pre").cast("double") / col("t").cast("double"))
    cnt.join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c"), col("c_w1"),
        col("n_post"), col("n_pre"),
        (col("c").cast("double") / col("c_w1").cast("double")).as("p_mle"),
        pKn.as("p_kn"))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  // ------------------------------------------------- q228 Good-Turing

  /** q228's frequency-spectrum cutoff: r* reported for r ≤ 20 (above
    * that, GT estimates are noise and LMs fall back to raw counts). */
  private[operators] val GtMaxR = 20

  /** q228 — Good-Turing frequency smoothing over trigram types: the
    * counts-of-counts table N_r, the adjusted count r* = (r+1)·N_{r+1}/N_r,
    * the smoothed probability p_GT = r* / N, and the unseen-mass estimate
    * P₀ = N₁/N. The classic answer to "how much probability should an LM
    * reserve for trigrams the corpus never saw" — and, with q218's
    * Kneser-Ney, the second standard smoother on the same counts.
    *
    * Exactness: trigram counts, N_r, N = Σ r·N_r and N₁ are exact
    * integers (N computed FROM the spectrum — no second corpus scan);
    * r* and p_GT are terminal double chains. r* is emitted only when the
    * next spectrum row is exactly r+1 (a lead() probe) — a gap in the
    * spectrum yields NULL, not a wrong ratio against a higher r.
    *
    * Scale shape: one scan-local n-gram explode (codegen'd
    * WordNgramList) into one (trigram) count — the only corpus-sized
    * shuffle; the spectrum groupBy, lead window and totals attach all
    * run on the ≤|distinct frequencies| frame (hundreds of rows at any
    * corpus size — frequency spectra are tiny by construction). */
  def goodTuring(s: SparkSession, docs: DataFrame, maxR: Int = GtMaxR): DataFrame = {
    VectorFunctions.register(s)
    val cnt = docs
      .select(explode(VectorFunctions.wordNgramList(col("text"), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("f"))
    val coc = cnt.groupBy(col("f")).agg(count(lit(1)).as("n_r"))
    val w = Window.orderBy(col("f"))
    val led = coc.withColumn("n_r1", lead(col("n_r"), 1).over(w))
      .withColumn("f_next", lead(col("f"), 1).over(w))
    val totals = coc.agg(
      sum(col("f").cast("decimal(19,0)") * col("n_r").cast("decimal(19,0)"))
        .as("n_grams"),
      sum(when(col("f") === 1, col("n_r")).otherwise(0L)).as("n1"))
    val rStar = when(col("f_next") === col("f") + 1 && col("n_r1") > 0,
      (col("f") + 1).cast("double") * col("n_r1").cast("double") /
        col("n_r").cast("double"))
    led.crossJoin(broadcast(totals))
      .filter(col("f") <= maxR)
      .select(col("f").as("r"), col("n_r"),
        rStar.otherwise(lit(null).cast("double")).as("r_star"),
        (rStar.otherwise(lit(null).cast("double")) /
          col("n_grams").cast("double")).as("p_gt"),
        (col("n1").cast("double") / col("n_grams").cast("double")).as("p0_mass"))
      .orderBy(col("r"))
  }

  // ------------------------------------------ q244 association rules

  /** q244's support floor (repeat co-purchases: the synthetic catalog is pair-sparse) and report size. */
  private[operators] val RuleMinPairN = 2L
  private[operators] val RuleTopN = 20

  /** q244 — association-rule metrics over co-purchased part pairs:
    * for each directed rule a→b with pair support ≥ [[RuleMinPairN]],
    * support, confidence, LIFT and LEVERAGE (Agrawal/Srikant rule
    * mining + the Piatetsky-Shapiro interestingness pair). q145 finds
    * frequent TRIPLES and q99 counts pairs; this is the rule-quality
    * layer a recommender actually ranks by — confidence alone promotes
    * popular items, lift corrects for both marginals.
    *
    * Exactness: all counts are exact integers (pair counts via the
    * q213 scan-local sorted-array expansion); the four metrics are
    * pinned terminal chains; top-N sorts on lift with (a, b) ties.
    *
    * Scale shape: one order-keyed basket shuffle + scan-local pair
    * expansion into a map-combinable (a, b) count; two broadcastable
    * item-count joins; one 1-row order-total attach; TakeOrdered. */
  def assocRules(s: SparkSession, lineitem: DataFrame,
                 topN: Int = RuleTopN): DataFrame = {
    val op = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val nO = op.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val items = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val pairs = lineitem.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "a")), col("ps"))
      .select(col("a"), explode(expr("slice(ps, i + 2, size(ps))")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= RuleMinPairN)
    val rules = pairs.select(col("a").as("ant"), col("b").as("cons"), col("n_ab"))
      .unionAll(pairs.select(col("b").as("ant"), col("a").as("cons"), col("n_ab")))
      .join(items.select(col("l_partkey").as("ant"), col("cnt").as("n_a")),
        Seq("ant"))
      .join(items.select(col("l_partkey").as("cons"), col("cnt").as("n_b")),
        Seq("cons"))
      .crossJoin(broadcast(nO))
    def dec(c: Column) = c.cast("decimal(19,0)")
    val nD = col("n_orders").cast("double")
    rules.select(col("ant"), col("cons"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / nD).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
        ((dec(col("n_ab")) * dec(col("n_orders"))).cast("double") /
          (dec(col("n_a")) * dec(col("n_b"))).cast("double")).as("lift"),
        (col("n_ab").cast("double") / nD -
          (col("n_a").cast("double") / nD) * (col("n_b").cast("double") / nD))
          .as("leverage"))
      .orderBy(col("lift").desc, col("ant"), col("cons"))
      .limit(topN)
  }

  // ------------------------------- q292 heavy hitters (Misra–Gries)

  /** Per-partition Misra–Gries summaries of a token stream, merged by a
    * bounded groupBy — the candidate-generation half of the two-pass
    * exact heavy-hitters plan ([[heavyHitters]]). Each partition keeps k
    * counters (classic MG: hit → increment, room → insert, full →
    * decrement-all and drop zeros); the emitted (token, residual) rows
    * are ≤ k per partition, so the merge shuffle is O(k × partitions)
    * REGARDLESS of corpus size. Guarantee (Misra & Gries 1982; mergeable
    * across partitions per Agarwal et al., PODS 2012): any token with
    * global frequency > n/(k+1) survives in at least one partition's
    * summary, because summed residuals undercount true frequency by at
    * most Σᵢ nᵢ/(k+1) = n/(k+1). mapPartitions is justified here: the
    * counter-eviction loop is genuinely per-partition imperative state
    * no builtin aggregate expresses. */
  private[graft] def mgCandidates(tokens: DataFrame, k: Int): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    tokens.select(col("token")).as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { t =>
        if (m.contains(t)) m(t) += 1
        else if (m.size < k) m(t) = 1L
        else {
          val kept = m.collect { case (kk, c) if c > 1 => kk -> (c - 1) }
          m.clear(); m ++= kept
        }
      }
      m.iterator
    }.toDF("token", "residual")
      .groupBy(col("token")).agg(sum(col("residual")).as("residual"))
  }

  /** q292 — exact heavy hitters over the corpus token stream via the
    * two-pass sketch plan: (1) [[mgCandidates]] — one scan, k counters
    * per partition, a O(k × partitions) merge; (2) an exact recount of
    * candidate tokens only (broadcast semi-join, so the second scan
    * shuffles candidate occurrences, never the full vocabulary), kept
    * when strictly above n/k. The MG guarantee makes the candidate set a
    * superset of every token with frequency > n/(k+1) ⊇ the > n/k
    * answer, so the result is EXACT — the oracle recomputes it by brute
    * groupBy. At 100 TB this is the difference between shuffling a
    * full-vocabulary aggregate (billions of keys) and shuffling ≤
    * k × partitions summary rows + the heavy tokens' own occurrences.
    * Tokenization is the repo-standard whitespace twin. */
  def heavyHitters(docs: DataFrame, k: Int = 200): DataFrame = {
    val toks = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
    val n = toks.count()
    val cands = mgCandidates(toks, k).select(col("token"))
    toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") * lit(k) > lit(n))
      .orderBy(col("n_occ").desc, col("token"))
  }

  // --------------------------- q296 streaming heavy hitters (round 13)

  /** Layout-aware documents stream (the EventsStream.readStream pattern:
    * driver testdata is a single FILE, the scale rehearsal a DIRECTORY). */
  private def docsReadStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    if (new java.io.File(s"$dir/documents.parquet").isDirectory)
      s.readStream.schema(schema).parquet(s"$dir/documents.parquet")
    else s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** q296 — the STREAMING twin of [[heavyHitters]], same answer, same
    * oracle: each micro-batch reduces to its own bounded MG summary
    * ([[mgCandidates]] — ≤ k × partitions rows, collected), which merges
    * into a k-counter DRIVER state by the mergeable-summaries rule (sum
    * counters, subtract the (k+1)-th largest, drop non-positive —
    * Agarwal et al., PODS 2012): repeated pairwise merging preserves the
    * n/(k+1) total undercount, so after the drain the state is a
    * candidate superset of every > n/k token and one exact recount
    * finishes the job. State is O(k) REGARDLESS of stream length or
    * vocabulary — the bounded-state story per-key streaming counts can't
    * give at 100 TB. The hash gate pins streaming ≡ batch ≡ brute-force
    * oracle, through the engine's micro-batch replay machinery. */
  def streamHeavyHitters(s: SparkSession, dir: String,
                         k: Int = 200): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val state = scala.collection.mutable.HashMap[String, Long]()
    var total = 0L
    val ckpt = java.nio.file.Files.createTempDirectory("graft-q296-ckpt")
    val toksStream = docsReadStream(s, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
    toksStream.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.persist()
        try {
          total += batch.count()
          mgCandidates(batch, k).collect().foreach { r =>
            val t = r.getString(0)
            state(t) = state.getOrElse(t, 0L) + r.getLong(1)
          }
          if (state.size > k) { // (k+1)-th largest is the merge cut
            val cut = state.values.toSeq.sorted(Ordering[Long].reverse)(k)
            val kept = state.collect {
              case (t, c) if c - cut > 0 => t -> (c - cut)
            }
            state.clear(); state ++= kept
          }
        } finally { batch.unpersist(); () }
        ()
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val cands = state.keys.toSeq.toDF("token")
    val toks = Tables.documents(s, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
    toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") * lit(k) > lit(total))
      .orderBy(col("n_occ").desc, col("token"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q296_stream_heavy_hitters" -> (streamHeavyHitters(_, _)),
    "q292_heavy_hitters" -> ((s, d) => heavyHitters(Tables.documents(s, d))),
    "q244_assoc_rules" -> ((s, d) => assocRules(s, Tables.lineitem(s, d))),
    "q228_good_turing" -> ((s, d) => goodTuring(s, Tables.documents(s, d))),
    "q218_kneser_ney" -> ((s, d) => kneserNey(s, Tables.documents(s, d))),
    "q204_neg_sample" -> ((s, d) => negSample(s, Tables.lineitem(s, d))),
    "q196_item_sim" -> ((s, d) => itemSim(s, Tables.lineitem(s, d))),
    "q148_pmi" -> ((s, d) => q148Pmi(s, d)),
    "q145_apriori" -> ((s, d) =>
      aprioriTriples(s, Tables.lineitem(s, d), Tables.orders(s, d))),
    "q69_dedup_canonical" -> (q69DedupCanonical _),
    "q70_tfidf" -> (q70Tfidf _),
    "q72_ann_rerank" -> ((s, d) => q72AnnRerank(s, d)),
    "q80_bigrams" -> (q80Bigrams _),
    "q81_group_sample" -> ((s, d) => q81GroupSample(s, d)),
    "q82_cdc_diff" -> (q82CdcDiff _),
    "q85_knn_classify" -> ((s, d) => q85KnnClassify(s, d))
  )

  /** DuckDB oracles. q69 recomputes the whole pipeline (shingles → pairs →
    * recursive-CTE closure → survivor join); q72 recomputes the int8
    * quantization and both ranking stages from first principles. */
  def oracles: Map[String, String] = Map(
    // the streaming path must land on the identical exact answer
    "q296_stream_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS n_occ
        |FROM t GROUP BY token
        |HAVING count(*) * 200 > (SELECT count(*) FROM t)
        |ORDER BY n_occ DESC, token""".stripMargin,
    // brute-force twin of the two-pass MG plan: exact by construction
    "q292_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS n_occ
        |FROM t GROUP BY token
        |HAVING count(*) * 200 > (SELECT count(*) FROM t)
        |ORDER BY n_occ DESC, token""".stripMargin,
    "q244_assoc_rules" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
         |      FROM op),
         |it AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
         |       FROM op GROUP BY l_partkey),
         |pr AS (
         |  SELECT x.l_partkey AS a, y.l_partkey AS b,
         |    CAST(count(*) AS BIGINT) AS n_ab
         |  FROM op x JOIN op y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
         |  GROUP BY 1, 2
         |  HAVING count(*) >= $RuleMinPairN),
         |ru AS (
         |  SELECT a AS ant, b AS cons, n_ab FROM pr
         |  UNION ALL
         |  SELECT b AS ant, a AS cons, n_ab FROM pr),
         |k AS (
         |  SELECT ru.ant, ru.cons, ru.n_ab, ia.cnt AS n_a, ib.cnt AS n_b,
         |    n.n_orders
         |  FROM ru
         |  JOIN it ia ON ia.l_partkey = ru.ant
         |  JOIN it ib ON ib.l_partkey = ru.cons
         |  CROSS JOIN n)
         |SELECT ant, cons, n_ab, n_a, n_b,
         |  CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
         |  CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS confidence,
         |  CAST(CAST(n_ab AS HUGEINT) * n_orders AS DOUBLE)
         |    / CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE) AS lift,
         |  CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE)
         |    - (CAST(n_a AS DOUBLE) / CAST(n_orders AS DOUBLE))
         |      * (CAST(n_b AS DOUBLE) / CAST(n_orders AS DOUBLE)) AS leverage
         |FROM k ORDER BY lift DESC, ant, cons LIMIT $RuleTopN""".stripMargin,
    "q228_good_turing" ->
      s"""WITH w AS (
         |  SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
         |t AS (
         |  SELECT unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |                 for i in range(1, len(ws) - 1)]) AS g
         |  FROM w WHERE len(ws) >= 3),
         |c AS (SELECT g, CAST(count(*) AS BIGINT) AS f FROM t GROUP BY g),
         |coc AS (SELECT f, CAST(count(*) AS BIGINT) AS n_r FROM c GROUP BY f),
         |led AS (
         |  SELECT f, n_r, lead(n_r, 1) OVER (ORDER BY f) AS n_r1,
         |    lead(f, 1) OVER (ORDER BY f) AS f_next
         |  FROM coc),
         |tot AS (
         |  SELECT sum(CAST(f AS HUGEINT) * n_r) AS n_grams,
         |    CAST(sum(CASE WHEN f = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
         |  FROM coc)
         |SELECT f AS r, n_r,
         |  CASE WHEN f_next = f + 1 AND n_r1 > 0 THEN
         |    CAST(f + 1 AS DOUBLE) * CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE)
         |  END AS r_star,
         |  (CASE WHEN f_next = f + 1 AND n_r1 > 0 THEN
         |    CAST(f + 1 AS DOUBLE) * CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE)
         |  END) / CAST(n_grams AS DOUBLE) AS p_gt,
         |  CAST(n1 AS DOUBLE) / CAST(n_grams AS DOUBLE) AS p0_mass
         |FROM led CROSS JOIN tot WHERE f <= $GtMaxR ORDER BY r""".stripMargin,
    "q218_kneser_ney" ->
      s"""WITH w AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
         |  FROM documents),
         |b AS (
         |  SELECT unnest([struct_pack(w1 := ws[i], w2 := ws[i+1])
         |                 for i in range(1, len(ws))]) AS s
         |  FROM w WHERE len(ws) >= 2),
         |c AS (SELECT s.w1 AS w1, s.w2 AS w2, CAST(count(*) AS BIGINT) AS c
         |      FROM b GROUP BY s.w1, s.w2),
         |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_w1,
         |          CAST(count(*) AS BIGINT) AS n_post
         |        FROM c GROUP BY w1),
         |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_pre FROM c GROUP BY w2),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c)
         |SELECT c.w1, c.w2, c.c AS c, ctx.c_w1, ctx.n_post, cont.n_pre,
         |  CAST(c.c AS DOUBLE) / CAST(ctx.c_w1 AS DOUBLE) AS p_mle,
         |  (CAST(c.c AS DOUBLE) - $KnDiscount) / CAST(ctx.c_w1 AS DOUBLE)
         |    + $KnDiscount * CAST(ctx.n_post AS DOUBLE) / CAST(ctx.c_w1 AS DOUBLE)
         |      * (CAST(cont.n_pre AS DOUBLE) / CAST(tt.t AS DOUBLE)) AS p_kn
         |FROM c JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tt
         |ORDER BY c.c DESC, c.w1, c.w2 LIMIT $KnTopN""".stripMargin,
    // same exp/ln weight chain, integer CDF, md5 coin; plain range join
    // in DuckDB (the engine bucketizes for an equi-join — same rows)
    "q204_neg_sample" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS pop FROM op GROUP BY pk),
         |wp AS (
         |  SELECT pk,
         |    CAST(floor(
         |      floor(exp(0.75 * (floor(ln(CAST(pop AS DOUBLE)) * 1.0e9 + 0.5)
         |        / 1.0e9)) * 1.0e6 + 0.5) / 1.0e6
         |      * 1.0e9) AS BIGINT) AS wq
         |  FROM deg),
         |cum AS (
         |  SELECT pk, wq,
         |    sum(wq) OVER (ORDER BY pk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
         |  FROM wp),
         |cl AS (SELECT pk, hi - wq AS lo, hi FROM cum),
         |tw AS (SELECT CAST(max(hi) AS BIGINT) AS w_tot FROM cum),
         |sl AS (SELECT unnest(generate_series(0, ${NegPerPos - 1})) AS slot),
         |tg AS (
         |  SELECT op.ok, op.pk, CAST(sl.slot AS BIGINT) AS slot,
         |    least(tw.w_tot - 1, CAST(floor(
         |      (CAST(('0x' || substr(md5(CAST(op.ok AS VARCHAR) || '-' ||
         |        CAST(op.pk AS VARCHAR) || '-' || CAST(sl.slot AS VARCHAR)), 1, 15))
         |        AS BIGINT) / 1152921504606846976.0)
         |      * CAST(tw.w_tot AS DOUBLE)) AS BIGINT)) AS t
         |  FROM op CROSS JOIN sl CROSS JOIN tw)
         |SELECT tg.ok AS l_orderkey, tg.pk AS l_partkey, tg.slot,
         |  c.pk AS neg_partkey, (c.pk = tg.pk) AS is_collision
         |FROM tg JOIN cl c ON tg.t >= c.lo AND tg.t < c.hi
         |ORDER BY l_orderkey, l_partkey, slot""".stripMargin,
    "q196_item_sim" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS deg FROM op GROUP BY pk),
         |cooc AS (
         |  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_co
         |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY a.pk, b.pk),
         |bi AS (
         |  SELECT pa AS item, pb AS neighbor, n_co FROM cooc
         |  UNION ALL
         |  SELECT pb AS item, pa AS neighbor, n_co FROM cooc),
         |sims AS (
         |  SELECT b.item, b.neighbor, b.n_co,
         |    CAST(b.n_co AS DOUBLE) / sqrt(CAST(di.deg * dn.deg AS DOUBLE)) AS cosine
         |  FROM bi b
         |  JOIN deg di ON di.pk = b.item
         |  JOIN deg dn ON dn.pk = b.neighbor),
         |r AS (
         |  SELECT item, neighbor, n_co, cosine,
         |    CAST(row_number() OVER (PARTITION BY item
         |      ORDER BY cosine DESC, n_co DESC, neighbor) AS BIGINT) AS rk
         |  FROM sims)
         |SELECT neighbor, item, n_co, cosine, rk
         |FROM r WHERE rk <= $ItemSimK
         |ORDER BY item, rk""".stripMargin,
    // same fixed ln-chain term order as the engine expression (q131
    // convention: IEEE addition order is pinned on both sides)
    "q148_pmi" ->
      s"""WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
        |  FROM documents),
        |uni AS (
        |  SELECT t.tok AS w, CAST(count(*) AS BIGINT) AS n
        |  FROM w, unnest(ws) t(tok) GROUP BY 1),
        |big AS (
        |  SELECT ws[i] AS w1, ws[i+1] AS w2, CAST(count(*) AS BIGINT) AS n12
        |  FROM w, unnest(range(1, len(ws))) r(i)
        |  GROUP BY 1, 2 HAVING count(*) >= $PmiMinCount),
        |tu AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM uni),
        |tb AS (
        |  SELECT CAST(sum(greatest(len(ws) - 1, 0)) AS DOUBLE) AS b FROM w)
        |SELECT b.w1, b.w2, b.n12, u1.n AS n1, u2.n AS n2,
        |  floor(ln(CAST(b.n12 AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9
        |    + floor(ln(tu.t) * 1.0e9 + 0.5) / 1.0e9
        |    + floor(ln(tu.t) * 1.0e9 + 0.5) / 1.0e9
        |    - floor(ln(tb.b) * 1.0e9 + 0.5) / 1.0e9
        |    - floor(ln(CAST(u1.n AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9
        |    - floor(ln(CAST(u2.n AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9 AS pmi
        |FROM big b
        |JOIN uni u1 ON u1.w = b.w1
        |JOIN uni u2 ON u2.w = b.w2
        |CROSS JOIN tu CROSS JOIN tb
        |ORDER BY pmi DESC, b.w1, b.w2 LIMIT $PmiTopN""".stripMargin,
    // brute-force triple enumeration + HAVING — deliberately ignorant of
    // Apriori pruning, so it cross-checks the pruned plan end to end
    // MATERIALIZED: d is referenced three times; DuckDB's per-reference
    // CTE inlining re-runs the distinct join each time (8 s -> 4.3 s)
    "q145_apriori" ->
      s"""WITH d AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey AS k, l_partkey AS p
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT a.p AS a, b.p AS b, c.p AS c,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM d a
        |JOIN d b ON a.k = b.k AND a.p < b.p
        |JOIN d c ON a.k = c.k AND b.p < c.p
        |GROUP BY 1, 2, 3 HAVING count(*) >= $TripleMinSup
        |ORDER BY a, b, c""".stripMargin,
    "q69_dedup_canonical" ->
      """WITH RECURSIVE
        |w AS MATERIALIZED (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct([list_aggr(w[i:i+2], 'string_agg', ' ')
        |                   for i in range(1, len(w)-1)]) AS s
        |  FROM w WHERE len(w) >= 3),
        |p AS MATERIALIZED (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8),
        |sym AS MATERIALIZED (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach AS MATERIALIZED (
        |  SELECT a AS src, a AS dst FROM sym
        |  UNION
        |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a),
        |cc AS MATERIALIZED (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
        |nrem AS MATERIALIZED (
        |  SELECT cluster_id, CAST(count(*) - 1 AS BIGINT) AS n_dups_removed
        |  FROM cc GROUP BY cluster_id)
        |SELECT d.doc_id, d.lang, d.source,
        |  COALESCE(nrem.n_dups_removed, 0) AS n_dups_removed
        |FROM documents d LEFT JOIN nrem ON d.doc_id = nrem.cluster_id
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q70_tfidf" ->
      """WITH tok AS (
        |  SELECT d.doc_id, t.t AS term
        |  FROM documents d, unnest(regexp_split_to_array(trim(d.text), '\s+')) AS t(t)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    CAST(tf.tf AS DOUBLE) *
      (floor(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1.0e9 + 0.5)
        / 1.0e9) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN nd),
        |r AS (
        |  SELECT doc_id, term, tf, tfidf,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term) AS INT) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, tf, tfidf, rnk FROM r WHERE rnk <= 5
        |ORDER BY doc_id, rnk""".stripMargin,
    "q72_ann_rerank" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS max_abs
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id, e,
        |    list_transform(e, x -> CAST(round(x *
        |      (CASE WHEN max_abs = 0 THEN 0.0 ELSE 127.0 / max_abs END)) AS DOUBLE)) AS q
        |  FROM v),
        |s1 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    a.e AS qe, b.e AS ne,
        |    list_cosine_similarity(a.q, b.q) AS approx
        |  FROM qv a JOIN qv b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |short AS (
        |  SELECT query_id, neighbor_id, qe, ne FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY approx DESC NULLS LAST, neighbor_id) AS arank
        |    FROM s1) WHERE arank <= 30),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    list_cosine_similarity(qe, ne) AS cosine
        |  FROM short),
        |rr AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC NULLS LAST, neighbor_id) AS INT) AS rank
        |  FROM r)
        |SELECT query_id, neighbor_id, cosine, rank FROM rr WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "q81_group_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rnk
        |  FROM documents)
        |SELECT doc_id, lang, rnk FROM r WHERE rnk <= 20
        |ORDER BY lang, rnk""".stripMargin,
    "q82_cdc_diff" ->
      """WITH a AS (
        |  SELECT o_custkey, count(*) AS n_old,
        |    sum(CAST(o_totalprice AS DECIMAL(30,6))) AS rev_old
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY o_custkey),
        |b AS (
        |  SELECT o_custkey, count(*) AS n_new,
        |    sum(CAST(o_totalprice AS DECIMAL(30,6))) AS rev_new
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
        |    n_old, n_new, rev_old, rev_new,
        |    CASE WHEN n_old IS NULL THEN 'added'
        |         WHEN n_new IS NULL THEN 'removed'
        |         WHEN n_old <> n_new OR rev_old <> rev_new THEN 'changed'
        |         ELSE 'unchanged' END AS change_type
        |  FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
        |SELECT o_custkey, change_type, n_old, n_new,
        |  CAST(rev_old AS DOUBLE) AS rev_old, CAST(rev_new AS DOUBLE) AS rev_new
        |FROM j WHERE change_type <> 'unchanged'
        |ORDER BY o_custkey""".stripMargin,
    "q85_knn_classify" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS e, label
        |      FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id, label,
        |    list_cosine_similarity(qe, e) AS cosine
        |  FROM q JOIN c ON query_id <> neighbor_id),
        |topk AS (
        |  SELECT query_id, label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |    FROM s) WHERE rank <= 10),
        |v AS (
        |  SELECT query_id, label, count(*) AS votes
        |  FROM topk GROUP BY query_id, label)
        |SELECT query_id, label AS predicted_label, votes FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY votes DESC, label) AS rnk
        |  FROM v) WHERE rnk = 1
        |ORDER BY query_id""".stripMargin,
    "q80_bigrams" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |b AS (
        |  SELECT unnest([struct_pack(w1 := ws[i], w2 := ws[i+1])
        |                 for i in range(1, len(ws))]) AS s
        |  FROM w WHERE len(ws) >= 2),
        |c AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n FROM b GROUP BY s.w1, s.w2),
        |tt AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_w1 FROM c GROUP BY w1)
        |SELECT c.w1, c.w2, c.n, tt.n_w1,
        |  CAST(c.n AS DOUBLE) / CAST(tt.n_w1 AS DOUBLE) AS p
        |FROM c JOIN tt USING (w1)
        |ORDER BY n DESC, w1, w2 LIMIT 50""".stripMargin
  )
}
