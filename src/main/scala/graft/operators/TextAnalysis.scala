package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Pin, TextFunctions, VectorFunctions}

/** Per-document text analysis for a training-data pipeline (north-star
  * extension): language id, quality scoring, token counting, fingerprinting.
  *
  * Everything here is a narrow projection of codegen'd builtins over one
  * scan — no shuffle at all (the fingerprint-collision window is the single
  * exception) — so throughput at 100 TB is scan-bound, exactly what a
  * corpus-wide quality pass needs.
  */
object TextAnalysis {

  /** Tiny per-language stopword anchors (heuristic n-gram-free language id;
    * deterministic and SQL-expressible — not a statistical model). */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t))).cast("int")

  /** Language guess: alphabetically-first language with the max stopword hit
    * count (deterministic tie-break, identical CASE chain in the oracle). */
  def langId(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val langs = stopwords.keys.toSeq.sorted
    val withHits = docs.select(
      (col("doc_id") +: langs.map(l => hits(toks, stopwords(l)).as(s"hits_$l"))): _*)
    val guess = langs.foldRight(lit("und")) { (l, els) =>
      val h = col(s"hits_$l")
      val isMax = langs.filterNot(_ == l)
        .map(o => h >= col(s"hits_$o")).reduce(_ && _)
      when(h > 0 && isMax, lit(l)).otherwise(els)
    }
    withHits.withColumn("lang_guess", guess)
      .select((Seq(col("doc_id"), col("lang_guess")) ++ langs.map(l => col(s"hits_$l"))): _*)
      .orderBy(col("doc_id"))
  }

  /** Quality metrics + a deterministic composite score. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).cast("int").as("n_tokens"),
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
        size(toks).cast("double")).as("mean_tok_len"),
      (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
        length(col("text")).cast("double")).as("punct_ratio"),
      (size(filter(toks, t => array_contains(
        array(stopwords("en").map(lit): _*), t))).cast("double") /
        size(toks).cast("double")).as("stopword_ratio"))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) *
          (lit(1.0) - col("punct_ratio")))
      .orderBy(col("doc_id"))
  }

  /** Token counts: whitespace tokens, regex (BPE-ish pre-tokenizer: letter
    * runs / digit runs / single punctuation) tokens, distinct tokens. */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).cast("int").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("int").as("regex_tokens"),
      size(array_distinct(toks)).cast("int").as("distinct_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Normalized-content fingerprints with collision counts (document-level
    * near-identical detection across layout variants). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs.select(col("doc_id"), TextFunctions.normalizedFingerprint(col("text")).as("fp"))
      .withColumn("fp_count", count(lit(1)).over(w).cast("bigint"))
      .select(col("doc_id"), col("fp"), col("fp_count"))
      .orderBy(col("doc_id"))
  }

  /** Context-window chunking: split each document into token windows of
    * `chunkTokens` with `overlap` tokens of overlap — the standard prep step
    * for embedding/attention-window pipelines. Declarative: one posexplode
    * over the window starts, chunk text rebuilt with slice+array_join (few
    * chunks per doc, so the HOF cost is per-chunk, not per-token). */
  def chunk(docs: DataFrame, chunkTokens: Int = 32, overlap: Int = 8): DataFrame = {
    require(overlap < chunkTokens)
    val stride = chunkTokens - overlap
    docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")))
      // window starts: 0, stride, 2*stride, ... while start < n_tok
      .withColumn("chunk_idx",
        explode(sequence(lit(0), greatest((col("n_tok") - lit(1)) / lit(stride), lit(0)).cast("int"))))
      .withColumn("start", col("chunk_idx") * lit(stride))
      .filter(col("start") < col("n_tok"))
      .select(
        col("doc_id"), col("chunk_idx"),
        array_join(slice(col("toks"), col("start") + lit(1), lit(chunkTokens)), " ").as("chunk_text"),
        least(col("n_tok") - col("start"), lit(chunkTokens)).cast("int").as("chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Corpus-relative term relevance (tf/df — the idf-free integer-exact
    * variant of tf-idf): document frequency over the corpus, term frequency
    * per doc, top-3 terms per doc by tf/df. Two shuffles total: the df
    * aggregate (broadcast back) and the per-doc window. */
  def topTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tokens.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), "term")
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Merge-step count pinned for q113/q114 AND their generated oracle SQL
    * (one source of truth, per the round-5 advice pattern). */
  val BpeSteps = 5

  /** BPE merge learning (Sennrich et al. 2016's vocabulary-driven
    * formulation, public): represent each distinct word as a space-joined
    * character-symbol string, then repeatedly (a) count adjacent symbol
    * pairs weighted by word frequency and (b) merge the most frequent pair
    * everywhere it occurs.
    *
    * Scale shape: the ONLY corpus-sized work is the one word-frequency
    * aggregate (shuffle on the word key); merge learning runs on the
    * cached vocab frame — bounded by |vocab|, not |corpus| — in BATCHED
    * passes: each pass is ONE action (a top-N collect of the sorted pair
    * frequencies) that yields as many merge steps as stay provably
    * identical to one-at-a-time learning (see [[selectExactBatch]]), so a
    * production 32k-merge fit costs a number of Spark jobs proportional to
    * the number of *conflicting* frequency plateaus, not to the vocab
    * budget (measured on the test corpus: 5 steps in 2 passes). The
    * driver holds k rows total. This is exactly how distributed BPE
    * trainers decompose the problem: corpus → vocab once, batched driver
    * loop over the bounded vocab after.
    *
    * Merge application is `trim(replace(replace(' '||sym||' ', ' a b ',
    * ' ab '), same, same))`: plain `replace` scans left-to-right over
    * non-overlapping occurrences with identical semantics in Spark
    * (UTF8String.replace), DuckDB, and java.lang.String — so the engine
    * and the oracle compute the same merge everywhere, at any parallelism.
    * Two passes reach a fixed point (pass 1 leaves leftover runs of ≤2
    * unmerged symbols, pass 2 clears them and creates no new adjacency).
    * Versus textbook greedy left-to-right BPE the result is identical for
    * same-pair runs of length ≤4 and token-count-identical at 5; at runs
    * ≥6 it deterministically under-merges (run of 6 → `aa a aa a`, 2
    * merges vs greedy's 3). Real text doesn't produce such runs — the
    * test corpus' max same-char run is 2, and BpeSpec pins that the whole
    * 5-step learn EQUALS an imperative Sennrich reference there, plus the
    * exact divergence shape on adversarial runs, so the trade
    * (replace-chain scan-locality over exact long-run greedy semantics)
    * is explicit and verified rather than latent.
    *
    * Pair counts use `WordNgramList` multiplicity (all adjacent pairs,
    * overlapping runs counted naively) — the standard Sennrich counting
    * convention. Ties break on pair string ascending: deterministic at any
    * parallelism and identical to the oracle's ORDER BY f DESC, pair.
    */
  def learnBpeMerges(spark: SparkSession, docs: DataFrame,
                     steps: Int = BpeSteps): Seq[(Int, String, String, Long)] = {
    graft.functions.VectorFunctions.register(spark)
    graft.core.CacheScope.scoped {
      val vocab0 = graft.core.CacheScope.cached(
        docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("freq"))
          .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"), col("freq")))
      var vocab = vocab0
      val out = Seq.newBuilder[(Int, String, String, Long)]
      val priorMerged = scala.collection.mutable.Set.empty[String]
      var step = 1
      var exhausted = false
      while (step <= steps && !exhausted) {
        val remaining = steps - step + 1
        // collect enough of the sorted prefix to fill a batch plus the
        // conflict pair that bounds the trim; truncation is handled
        // conservatively in selectExactBatch (unseen rows may tie the last
        // collected frequency)
        val topN = math.min(remaining * 4 + 16, 512)
        val top = vocab
          .select(explode(graft.functions.VectorFunctions.wordNgramList(col("sym"), 2)).as("pair"),
            col("freq"))
          .groupBy(col("pair")).agg(sum(col("freq")).as("f"))
          .orderBy(col("f").desc, col("pair"))
          .limit(topN).collect()
        if (top.isEmpty) exhausted = true
        else {
          val sorted = top.map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
          val batch = selectExactBatch(sorted, remaining, priorMerged,
            sawAllPairs = top.length < topN)
          batch.foreach { case (pair, f) =>
            val Array(lhs, rhs) = pair.split(" ", 2)
            out += ((step, lhs, rhs, f))
            priorMerged += (lhs + rhs)
            step += 1
          }
          // apply the whole batch in ONE select — merges are mutually
          // disjoint so sequential textual application commutes with this
          // single fold, and the pass costs one action instead of |batch|
          vocab = vocab.select(
            batch.foldLeft(col("sym")) { case (s, (pair, _)) =>
              val Array(lhs, rhs) = pair.split(" ", 2)
              val pat = lit(" " + pair + " ")
              val rep = lit(" " + lhs + rhs + " ")
              val padded = concat(lit(" "), s, lit(" "))
              trim(call_function("replace",
                call_function("replace", padded, pat, rep), pat, rep))
            }.as("sym"),
            col("freq"))
        }
      }
      out.result()
    }
  }

  /** Exact batched-BPE selection (the "top-m non-overlapping merges per
    * pass" trick, made PROVABLY identical to one-merge-at-a-time Sennrich
    * learning rather than the usual approximation):
    *
    * walk the (freq desc, pair asc)-sorted pair list and greedily select
    * pairs, where a candidate `l r` CONFLICTS if `l`, `r`, or its merged
    * string `l+r` is already used by this batch, or `l+r` aliases a merge
    * symbol created in an earlier step (`priorMerged`). Stop at the first
    * conflict and trim the selection to frequencies STRICTLY above the
    * conflict's.
    *
    * Why that is exact: applying a merge `(l,r)→lr` only changes counts of
    * pairs containing `l`, `r`, or `lr` — every pair it creates embeds an
    * original occurrence of a pair overlapping `{l,r}`, so (given no
    * aliasing, which the `priorMerged` check rules out — initial symbols
    * are single chars, so any multi-char symbol is a prior merge string)
    * a changed pair's count is bounded by the first conflict's frequency
    * `fCut`: changed pairs sort at-or-after the conflict position, hence
    * carry `f ≤ fCut`. Selected pairs keep their original counts (mutually
    * disjoint), are strictly above `fCut` after the trim, and appear in
    * (f desc, pair asc) order — so each one is the sequential argmax at
    * its own step, ties included. Stopping early is always exact (the next
    * pass recounts), and a batch is never empty: the FIRST sorted pair is
    * the sequential argmax by definition, so progress is guaranteed.
    *
    * `sawAllPairs=false` means the collect was truncated at `limit(topN)`:
    * unseen pairs may tie the last collected frequency, so the cut bound
    * extends to it. */
  private[graft] def selectExactBatch(
      sorted: IndexedSeq[(String, Long)], maxBatch: Int,
      priorMerged: scala.collection.Set[String],
      sawAllPairs: Boolean): Seq[(String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var i = 0
    var fCut = -1L
    var conflicted = false
    while (i < sorted.length && !conflicted && sel.length < maxBatch) {
      val (pair, f) = sorted(i)
      val Array(l, r) = pair.split(" ", 2)
      val m = l + r
      if (used(l) || used(r) || used(m) || priorMerged(m)) {
        fCut = f; conflicted = true
      } else {
        sel += ((pair, f)); used += l; used += r; used += m; i += 1
      }
    }
    if (!conflicted) {
      if (i < sorted.length) fCut = sorted(i)._2 // batch cap: next pair bounds the trim
      else if (!sawAllPairs && sorted.nonEmpty) fCut = sorted.last._2 // truncated collect
      // else: the walk consumed EVERY pair in the vocab — nothing to trim against
    }
    val trimmed = if (fCut >= 0) sel.takeWhile(_._2 > fCut).toSeq else sel.toSeq
    // progress guarantee: the FIRST sorted pair is the sequential argmax by
    // definition (aliasing only perturbs LATER steps' counts), so it is
    // always exact as a singleton batch — even when it conflicted or tied
    if (trimmed.isEmpty) sorted.take(1).toSeq else trimmed
  }

  /** q113 — the learned merge table as a DataFrame (step, lhs, rhs, merged,
    * freq). Bounded output (`steps` rows); all distributed work happens in
    * [[learnBpeMerges]]. */
  def bpeMerges(spark: SparkSession, docs: DataFrame,
                steps: Int = BpeSteps): DataFrame = {
    import spark.implicits._
    learnBpeMerges(spark, docs, steps)
      .map { case (s, l, r, f) => (s, l, r, l + r, f) }
      .toDF("step", "lhs", "rhs", "merged", "freq")
      .orderBy(col("step"))
  }

  /** q114 — encode the corpus with the learned merges: per document, the
    * character-symbol count and the BPE token count after applying the
    * merge sequence to every word, plus the compression ratio.
    *
    * Scale shape: ZERO shuffles beyond q113's bounded learn phase — the
    * merge list is a driver-side constant folded into a scan-local HOF
    * chain (`transform` over the token array, five literal replaces per
    * word), so corpus throughput is scan-bound like q105. The alternative
    * (encode each DISTINCT word once, broadcast the vocab→length map,
    * join) pays each word's replace chain once instead of once per
    * occurrence but adds a vocab broadcast that dies when the vocab
    * outgrows memory — the scan-local form has no such cliff. */
  def bpeEncode(spark: SparkSession, docs: DataFrame,
                steps: Int = BpeSteps): DataFrame = {
    val merges = learnBpeMerges(spark, docs, steps)
    def encodeWord(w: Column): Column = {
      val sym0 = trim(regexp_replace(w, "(.)", "$1 "))
      merges.foldLeft(sym0) { case (s, (_, lhs, rhs, _)) =>
        val pat = lit(s" $lhs $rhs ")
        val rep = lit(s" $lhs$rhs ")
        val padded = concat(lit(" "), s, lit(" "))
        trim(call_function("replace",
          call_function("replace", padded, pat, rep), pat, rep))
      }
    }
    docs.select(
      col("doc_id"),
      length(regexp_replace(col("text"), "\\s", "")).cast("int").as("n_char_syms"),
      aggregate(
        transform(TextFunctions.tokens(col("text")), w => size(split(encodeWord(w), " "))),
        lit(0), (acc, x) => acc + x).cast("int").as("n_bpe_tokens"))
      .withColumn("compression",
        col("n_char_syms").cast("double") / col("n_bpe_tokens").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** q280 — tokenizer fertility by language: per-lang chars-per-BPE-token
    * under the corpus-learned merges (q113/q114 machinery). Fertility
    * parity across languages is the standard tokenizer-equity audit
    * (languages a tokenizer fragments pay more tokens — so more compute
    * and context — for the same text; cf. the public multilingual
    * tokenizer analyses around XLM-R/BLOOM): the per-lang ratio of
    * exact char and token sums surfaces exactly that skew.
    *
    * Scale shape: q114's scan-local encode (merge list folded into the
    * scan as literal replaces, zero per-row shuffles) followed by ONE
    * lang-keyed integer aggregate — corpus throughput stays scan-bound;
    * the division happens once per language. */
  def bpeFertility(spark: SparkSession, docs: DataFrame,
                   steps: Int = BpeSteps): DataFrame = {
    val enc = bpeEncode(spark, docs, steps)
      .select(col("doc_id"), col("n_char_syms"), col("n_bpe_tokens"))
    enc.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_char_syms").cast("long")).as("chars"),
        sum(col("n_bpe_tokens").cast("long")).as("bpe_tokens"))
      .withColumn("fertility",
        col("chars").cast("double") / col("bpe_tokens").cast("double"))
      .orderBy(col("lang"))
  }

  // --------------------------------------------------------------------- //

  /** q151's pinned n-gram width (the q87/q112 leakage convention). */
  private[operators] val NoveltyN = 8

  /** q151 — per-document n-gram novelty against everything EARLIER in the
    * corpus (doc_id order = arrival order): the fraction of a doc's
    * distinct 8-grams whose first corpus occurrence is this doc. The
    * memorization/staleness signal a streaming ingest pipeline tracks —
    * novelty collapsing toward 0 means the crawl is re-reading itself
    * (the n-gram-overlap methodology of Lee et al. 2022, public).
    *
    * Scale shape: grams hash to h60 scan-locally (8-byte shuffle keys, the
    * q112 convention); first-occurrence is ONE partial+final min-aggregate
    * on the gram key over distinct (doc, gram) pairs; the per-doc rollup
    * is one count/count-if aggregate on doc_id. Two key-shuffles total,
    * both map-side combinable. Docs with < n tokens have no grams and are
    * excluded (novelty is undefined, matching the oracle's inner
    * grouping). Pure integer counts + one final division. */
  def ngramNovelty(docs: DataFrame, n: Int = NoveltyN): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val grams = docs
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions.wordNgramList(col("text"), n)).as("g"))
      .select(col("doc_id"), TextFunctions.h60(col("g")).as("g"))
      .distinct()
    val first = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams").cast("double")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** q159's pinned coverage checkpoints (top-k vocabulary sizes). */
  private[operators] val CovKs = Seq(10, 100, 1000, 10000)

  /** q159 — vocabulary coverage curve: what fraction of all token
    * OCCURRENCES the top-k most frequent types cover, at the pinned
    * checkpoints — the tokenizer/vocab-budget planning stat (pick the
    * smallest vocab whose coverage clears the target; the Zipf elbow is
    * read straight off this curve).
    *
    * Scale shape: one vocab-keyed count aggregate (map-side combinable) is
    * the only corpus-sized work; the top-max(k) cut plans as
    * TakeOrderedAndProject (per-partition heaps — NO global sort, NO
    * unpartitioned window over the full vocabulary), and the rank window
    * runs on that ≤ max(k)-row bounded frame, so it is single-partition by
    * construction at any corpus size. Checkpoints ride ONE conditional-sum
    * aggregate + stack unpivot (the q107/q126 convention). Integer counts
    * throughout; coverage is one final double division per row. */
  def coverageCurve(docs: DataFrame, ks: Seq[Int] = CovKs): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum(col("n")).as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    val ranked = counts.orderBy(col("n").desc, col("w")).limit(ks.max)
      .withColumn("r", row_number().over(
        Window.orderBy(col("n").desc, col("w"))).cast("long"))
    val agg = ranked.agg(
      ks.map(k => sum(when(col("r") <= k, col("n")).otherwise(0L)).as(s"c_$k")).head,
      ks.tail.map(k => sum(when(col("r") <= k, col("n")).otherwise(0L)).as(s"c_$k")): _*)
    agg.select(expr(s"stack(${ks.length}, " +
        ks.map(k => s"$k, c_$k").mkString(", ") + ") AS (k, covered_tokens)"))
      .crossJoin(broadcast(stats))
      .select(col("k"), col("vocab_size"), col("covered_tokens"),
        col("total_tokens"),
        (col("covered_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("coverage"))
      .orderBy(col("k"))
  }

  /** q166 — per-source token-length histogram in power-of-two buckets:
    * the sequence-length profile a packing/batching pass (q86) plans
    * against — how much of each source lands in the 16-31, 32-63, …
    * token bands, and the token mass per band.
    *
    * Exactness: the bucket is bitlength(n_tokens) − 1 via `length(bin(n))`
    * — the q149 integer-bitlength convention, no log2 doubles near
    * power-of-two boundaries, identical in DuckDB as
    * `length(format('{:b}', n))`. Scale shape: scan-local token count +
    * one (source, bucket) partial+final aggregate; zero joins. */
  def lengthHistogram(docs: DataFrame): DataFrame = {
    val n = size(TextFunctions.tokens(col("text"))).cast("long")
    docs.select(col("source"), n.as("n_tok"))
      .filter(col("n_tok") >= 1)
      .withColumn("bucket", (length(bin(col("n_tok"))) - lit(1)).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .withColumn("bucket_lo", expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"))
      .select(col("source"), col("bucket"), col("bucket_lo"),
        col("n_docs"), col("total_tokens"))
      .orderBy(col("source"), col("bucket"))
  }

  // --------------------------------------------------- q237 burstiness

  /** q237's support floor and report size. */
  private[operators] val BurstMinDf = 20
  private[operators] val BurstTopN = 30

  /** q237 — term burstiness (Church & Gale 1995): content words do not
    * arrive Poisson — once a term appears in a document it tends to
    * repeat. For every term with df ≥ [[BurstMinDf]]: p_repeat =
    * P(≥2 occurrences | ≥1) and extra_rate = mean extra occurrences per
    * containing doc ((n−df)/df). Ranks the corpus's topical terms
    * (bursty) apart from function words (flat) with no stopword list —
    * the feature-selection signal next to q131's supervised MI and
    * q43's raw tf. Top-[[BurstTopN]] by p_repeat, ties by term.
    *
    * Exactness: df / multi-doc / total counts are exact integers off
    * one (token, doc) count; the two rates are terminal divisions.
    * Scale shape: one scan-local token explode → (token, doc_id) count
    * (map-side combinable) → token rollup; TakeOrdered top-N, no
    * global sort. */
  def burstiness(docs: DataFrame): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("k"))
    perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sum(when(col("k") >= 2, 1L).otherwise(0L)).as("multi_df"),
        sum(col("k")).as("total_n"))
      .filter(col("df") >= BurstMinDf)
      .select(col("token"), col("df"), col("multi_df"), col("total_n"),
        (col("multi_df").cast("double") / col("df").cast("double"))
          .as("p_repeat"),
        ((col("total_n") - col("df")).cast("double") / col("df").cast("double"))
          .as("extra_rate"))
      .orderBy(col("p_repeat").desc, col("token"))
      .limit(BurstTopN)
  }

  // --------------------------------------------- q238 hapax concentration

  /** q238's report size. */
  private[operators] val HapaxTopN = 20

  /** q238 — hapax-concentration screen: per document, the fraction of
    * its trigrams that are corpus-unique (occur exactly once in the
    * whole corpus). Clean text shares its n-grams; OCR garbage, mangled
    * encodings and machine-generated noise are made of n-grams nobody
    * else produces — a high hapax rate is the classic garbage detector
    * that needs no language model (complements q31's surface heuristics
    * and q92's LM score). Top-[[HapaxTopN]] docs by rate (ties by
    * doc_id), plus each doc's source for triage.
    *
    * Exactness: trigram corpus counts and per-doc hapax counts are
    * exact integers; the rate is one terminal division. Scale shape:
    * one scan-local n-gram explode feeding BOTH the corpus count and
    * the per-doc rollup (the (trigram) count joins back onto the same
    * exploded stream — key-shuffled, map-combinable), then TakeOrdered
    * top-N. */
  def hapaxDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val tri = docs.select(col("doc_id"), col("source"),
      explode(VectorFunctions.wordNgramList(col("text"), 3)).as("g"))
    val corpus = tri.groupBy(col("g")).agg(count(lit(1)).as("cn"))
    tri.join(corpus, Seq("g"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("cn") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("source"), col("n_trigrams"), col("n_hapax"),
        (col("n_hapax").cast("double") / col("n_trigrams").cast("double"))
          .as("hapax_rate"))
      .orderBy(col("hapax_rate").desc, col("doc_id"))
      .limit(HapaxTopN)
  }

  /** q327 — per-document TOKEN-ENTROPY quality filter (the classic
    * repetitiveness signal of the C4/Gopher quality screens: templated
    * and looping documents have low token-distribution entropy). Per
    * doc, `H = ln L − (1/L)·Σ_w c_w·ln c_w` over the token histogram;
    * a doc is flagged LOW-ENTROPY when its entropy falls below the
    * corpus mean — and that comparison is EXACT integer arithmetic
    * (per-doc scaled-long entropy × corpus count vs the corpus sum over
    * a common denominator), so the flag is bit-stable cross-engine.
    * Every `ln` is grid-pinned at the transcendental (the round-11
    * rule); per-doc terms are floor-scaled longs, so every sum is
    * order-free. Outputs stay INTEGER (scaled sums), never dividing a
    * >2^53 integer into a double.
    *
    * Scale shape: token explode → two partial-aggregated shuffles
    * (doc×token, then doc) → a 1-row global broadcast → one tiny lang
    * rollup. No window, no cross-join beyond the 1-row mean; 100 TB
    * cost is the token explode every corpus statistic here pays. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val cs = docs
      .select(col("doc_id"), col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
    // Σ c·pin(ln c) as floor-scaled longs (inner 1e9 scale matches the
    // pin grid); len = L
    val perDoc = cs.groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("len"),
        sum(floor(col("c").cast("double") *
            Pin.grid9(log(col("c").cast("double"))) * lit(1.0e9))
          .cast("decimal(38,0)")).as("t"))
      // e = floor(H · 1e12): the per-doc integer entropy
      .withColumn("e",
        floor((Pin.grid9(log(col("len").cast("double"))) -
          (col("t").cast("double") / lit(1.0e9)) /
            col("len").cast("double")) * lit(1.0e12)).cast("long"))
    val global = perDoc.agg(
      sum(col("e").cast("decimal(38,0)")).as("se"),
      count(lit(1)).as("n"))
    perDoc.crossJoin(broadcast(global))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("e").cast("decimal(38,0)") *
            col("n").cast("decimal(38,0)") < col("se"), 1L)
          .otherwise(0L)).as("n_low"),
        // integer-divided to a 1e6 grid before the per-lang sum, so the
        // output stays a plain BIGINT at any SF (the internal flag math
        // keeps full e12 precision above)
        sum(expr("e DIV 1000000")).as("sum_e6"),
        min(col("e")).as("min_e"))
      .orderBy(col("lang"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q327_token_entropy" -> ((s, d) => tokenEntropy(Tables.documents(s, d))),
    "q238_hapax_docs" -> ((s, d) => hapaxDocs(s, Tables.documents(s, d))),
    "q237_burstiness" -> ((s, d) => burstiness(Tables.documents(s, d))),
    "q166_len_histogram" -> ((s, d) => lengthHistogram(Tables.documents(s, d))),
    "q159_coverage_curve" -> ((s, d) => coverageCurve(Tables.documents(s, d))),
    "q151_ngram_novelty" -> ((s, d) => ngramNovelty(Tables.documents(s, d))),
    "q42_text_chunks" -> ((s, d) => chunk(Tables.documents(s, d))),
    "q43_top_terms" -> ((s, d) => topTerms(Tables.documents(s, d))),
    "q30_text_langid" -> ((s, d) => langId(Tables.documents(s, d))),
    "q31_text_quality" -> ((s, d) => quality(Tables.documents(s, d))),
    "q32_text_tokens" -> ((s, d) => tokenCounts(Tables.documents(s, d))),
    "q33_text_fingerprint" -> ((s, d) => fingerprints(Tables.documents(s, d))),
    "q113_bpe_merges" -> ((s, d) => bpeMerges(s, Tables.documents(s, d))),
    "q114_bpe_encode" -> ((s, d) => bpeEncode(s, Tables.documents(s, d))),
    "q280_bpe_fertility" -> ((s, d) => bpeFertility(s, Tables.documents(s, d)))
  )

  /** Chained-CTE DuckDB twin of the BPE learn loop: v0 = char-symbol vocab
    * with corpus word frequencies, then per step i: pair counts p_i, argmax
    * b_i (same f DESC, pair tiebreak), merged vocab v_i via the identical
    * padded double-replace. */
  private def bpeLearnCtes(steps: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |v0 AS (
        |  SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS sym,
        |    CAST(count(*) AS BIGINT) AS freq
        |  FROM w GROUP BY 1)""".stripMargin)
    for (i <- 1 to steps) {
      val prev = s"v${i - 1}"
      sb.append(s""",
        |p$i AS (
        |  SELECT ws[CAST(r.i AS INT) + 1] || ' ' || ws[CAST(r.i AS INT) + 2] AS pair,
        |    CAST(sum(freq) AS BIGINT) AS f
        |  FROM (SELECT string_split(sym, ' ') AS ws, freq FROM $prev),
        |    unnest(range(0, len(ws) - 1)) AS r(i)
        |  GROUP BY 1),
        |b$i AS (SELECT pair, f FROM p$i ORDER BY f DESC, pair LIMIT 1),
        |v$i AS (
        |  SELECT trim(replace(replace(' ' || sym || ' ',
        |      ' ' || (SELECT pair FROM b$i) || ' ',
        |      ' ' || (SELECT replace(pair, ' ', '') FROM b$i) || ' '),
        |      ' ' || (SELECT pair FROM b$i) || ' ',
        |      ' ' || (SELECT replace(pair, ' ', '') FROM b$i) || ' ')) AS sym, freq
        |  FROM $prev)""".stripMargin)
    }
    sb.toString
  }

  /** MATERIALIZED is load-bearing on every BPE oracle (round 13): DuckDB
    * inlines plain CTEs per reference, and the merge chain references each
    * round's CTEs repeatedly — the learn pipeline re-evaluates
    * exponentially (q113: 20 s -> 0.1 s at sf0.01, identical results). */
  private def materialized(sql: String): String =
    sql.replaceAll("""(\w+) AS \(""", "$1 AS MATERIALIZED (")

  private def bpeMergesSql(steps: Int): String =
    materialized(bpeLearnCtes(steps) + "\nSELECT * FROM (" +
      (1 to steps).map(i =>
        s"SELECT CAST($i AS INT) AS step, split_part(pair, ' ', 1) AS lhs, " +
          s"split_part(pair, ' ', 2) AS rhs, replace(pair, ' ', '') AS merged, " +
          s"f AS freq FROM b$i").mkString(" UNION ALL ") +
      ") ORDER BY step")

  private def bpeFertilitySql(steps: Int): String = {
    val mcols = (1 to steps).map(i => s"(SELECT pair FROM b$i) AS pair$i").mkString(", ")
    var enc = """trim(regexp_replace(w, '(.)', '\1 ', 'g'))"""
    for (i <- 1 to steps) {
      val p = s"' ' || pair$i || ' '"
      val r = s"' ' || replace(pair$i, ' ', '') || ' '"
      enc = s"trim(replace(replace(' ' || $enc || ' ', $p, $r), $p, $r))"
    }
    materialized(bpeLearnCtes(steps) + s""",
      |m AS (SELECT $mcols),
      |enc AS (
      |  SELECT lang,
      |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS ch,
      |    CAST(list_aggregate(list_transform(regexp_split_to_array(trim(text), '\\s+'),
      |      w -> len(string_split($enc, ' '))), 'sum') AS BIGINT) AS tk
      |  FROM documents, m)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(ch) AS BIGINT) AS chars,
      |  CAST(sum(tk) AS BIGINT) AS bpe_tokens,
      |  CAST(sum(ch) AS DOUBLE) / CAST(sum(tk) AS DOUBLE) AS fertility
      |FROM enc GROUP BY lang ORDER BY lang""".stripMargin)
  }

  private def bpeEncodeSql(steps: Int): String = {
    val mcols = (1 to steps).map(i => s"(SELECT pair FROM b$i) AS pair$i").mkString(", ")
    var enc = """trim(regexp_replace(w, '(.)', '\1 ', 'g'))"""
    for (i <- 1 to steps) {
      val p = s"' ' || pair$i || ' '"
      val r = s"' ' || replace(pair$i, ' ', '') || ' '"
      enc = s"trim(replace(replace(' ' || $enc || ' ', $p, $r), $p, $r))"
    }
    materialized(bpeLearnCtes(steps) + s""",
      |m AS (SELECT $mcols)
      |SELECT doc_id,
      |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS INT) AS n_char_syms,
      |  CAST(list_aggregate(list_transform(regexp_split_to_array(trim(text), '\\s+'),
      |    w -> len(string_split($enc, ' '))), 'sum') AS INT) AS n_bpe_tokens,
      |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) /
      |    CAST(list_aggregate(list_transform(regexp_split_to_array(trim(text), '\\s+'),
      |      w -> len(string_split($enc, ' '))), 'sum') AS DOUBLE) AS compression
      |FROM documents, m
      |ORDER BY doc_id""".stripMargin)
  }

  private val langCase: String = {
    val langs = stopwords.keys.toSeq.sorted
    val whens = langs.map { l =>
      val others = langs.filterNot(_ == l).map(o => s"hits_$l >= hits_$o").mkString(" AND ")
      s"WHEN hits_$l > 0 AND $others THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  private def hitsSql(l: String): String = {
    val set = stopwords(l).map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(toks, t -> t IN ($set))) AS INT) AS hits_$l"
  }

  def oracles: Map[String, String] = Map(
    // identical term structure and fold order as the engine: pinned ln
    // at each transcendental, floor-scaled integer sums, exact integer
    // mean comparison — outputs stay integer (never HUGEINT->DOUBLE)
    "q327_token_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, tk.w AS w
        |  FROM documents,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) tk(w)),
        |cs AS (
        |  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY doc_id, lang, w),
        |pd AS (
        |  SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS len,
        |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) *
        |      (floor(ln(CAST(c AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9)
        |      * 1.0e9) AS HUGEINT)) AS HUGEINT) AS t
        |  FROM cs GROUP BY doc_id, lang),
        |pe AS (
        |  SELECT doc_id, lang,
        |    CAST(floor((floor(ln(CAST(len AS DOUBLE)) * 1.0e9 + 0.5) / 1.0e9
        |      - (CAST(t AS DOUBLE) / 1.0e9) / CAST(len AS DOUBLE))
        |      * 1.0e12) AS BIGINT) AS e
        |  FROM pd),
        |g AS (SELECT CAST(sum(e) AS HUGEINT) AS se,
        |        CAST(count(*) AS HUGEINT) AS n FROM pe)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN CAST(e AS HUGEINT) * (SELECT n FROM g)
        |    < (SELECT se FROM g) THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(e // 1000000) AS BIGINT) AS sum_e6,
        |  CAST(min(e) AS BIGINT) AS min_e
        |FROM pe GROUP BY lang ORDER BY lang""".stripMargin,
    "q238_hapax_docs" ->
      s"""WITH w AS (
         |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS ws
         |  FROM documents),
         |t AS (
         |  SELECT doc_id, source,
         |    unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |            for i in range(1, len(ws) - 1)]) AS g
         |  FROM w WHERE len(ws) >= 3),
         |c AS (SELECT g, CAST(count(*) AS BIGINT) AS cn FROM t GROUP BY g),
         |per AS (
         |  SELECT t.doc_id, t.source, CAST(count(*) AS BIGINT) AS n_trigrams,
         |    CAST(sum(CASE WHEN c.cn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |  FROM t JOIN c USING (g)
         |  GROUP BY t.doc_id, t.source)
         |SELECT doc_id, source, n_trigrams, n_hapax,
         |  CAST(n_hapax AS DOUBLE) / CAST(n_trigrams AS DOUBLE) AS hapax_rate
         |FROM per ORDER BY hapax_rate DESC, doc_id LIMIT $HapaxTopN""".stripMargin,
    "q237_burstiness" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM documents),
         |pd AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS k
         |       FROM t GROUP BY token, doc_id),
         |agg AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS df,
         |    CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS multi_df,
         |    CAST(sum(k) AS BIGINT) AS total_n
         |  FROM pd GROUP BY token)
         |SELECT token, df, multi_df, total_n,
         |  CAST(multi_df AS DOUBLE) / CAST(df AS DOUBLE) AS p_repeat,
         |  CAST(total_n - df AS DOUBLE) / CAST(df AS DOUBLE) AS extra_rate
         |FROM agg WHERE df >= $BurstMinDf
         |ORDER BY p_repeat DESC, token LIMIT $BurstTopN""".stripMargin,
    "q166_len_histogram" ->
      """WITH n AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT source, n_tok,
        |    CAST(length(format('{:b}', n_tok)) - 1 AS BIGINT) AS bucket
        |  FROM n WHERE n_tok >= 1)
        |SELECT source, bucket,
        |  CAST(1 AS BIGINT) << CAST(bucket AS INT) AS bucket_lo,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,
    // same top-max(k) cut + rank + conditional sums per checkpoint
    "q159_coverage_curve" -> {
      val ksList = CovKs.mkString(", ")
      s"""WITH t AS (
        |  SELECT tk.w AS w
        |  FROM documents,
        |    unnest(regexp_split_to_array(trim(text), '\\s+')) tk(w)),
        |c AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY w),
        |s AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab_size
        |  FROM c),
        |top AS (SELECT w, n FROM c ORDER BY n DESC, w LIMIT ${CovKs.max}),
        |r AS (
        |  SELECT n, CAST(row_number() OVER (ORDER BY n DESC, w) AS BIGINT) AS r
        |  FROM top),
        |ks AS (SELECT CAST(u.k AS INT) AS k FROM unnest([$ksList]) u(k)),
        |cov AS (
        |  SELECT ks.k,
        |    CAST(sum(CASE WHEN r.r <= ks.k THEN r.n ELSE 0 END) AS BIGINT)
        |      AS covered_tokens
        |  FROM ks CROSS JOIN r GROUP BY ks.k)
        |SELECT cov.k, s.vocab_size, cov.covered_tokens, s.total_tokens,
        |  CAST(cov.covered_tokens AS DOUBLE) / CAST(s.total_tokens AS DOUBLE)
        |    AS coverage
        |FROM cov CROSS JOIN s
        |ORDER BY cov.k""".stripMargin
    },
    // q112's gram-hash convention (h60 of the space-joined window), min
    // first-occurrence, inner per-doc rollup
    "q151_ngram_novelty" ->
      s"""WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(('0x' || substr(md5(list_aggregate(
        |      ws[CAST(r.i AS INT) + 1 : CAST(r.i AS INT) + $NoveltyN],
        |      'string_agg', ' ')), 1, 15)) AS BIGINT) AS g
        |  FROM w, unnest(range(0, len(ws) - ${NoveltyN - 1})) AS r(i)),
        |f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS novelty
        |FROM g JOIN f USING (g)
        |GROUP BY g.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    "q42_text_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, len(w) AS n, CAST(i AS INT) AS chunk_idx,
        |    CAST(i * 24 AS INT) AS start
        |  FROM t, unnest(range(0, (len(w)-1)//24 + 1)) AS r(i)
        |  WHERE i * 24 < len(w))
        |SELECT doc_id, chunk_idx,
        |  list_aggr(w[start+1 : start+32], 'string_agg', ' ') AS chunk_text,
        |  CAST(least(n - start, 32) AS INT) AS chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q43_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |j AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |    CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS score
        |  FROM tf t JOIN df d USING (term)),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS INT) AS rank FROM j)
        |SELECT doc_id, rank, term, tf, df, score FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q30_text_langid" -> {
      val langs = stopwords.keys.toSeq.sorted
      s"""WITH t AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |h AS (SELECT doc_id, ${langs.map(hitsSql).mkString(", ")} FROM t)
         |SELECT doc_id, $langCase AS lang_guess, ${langs.map(l => s"hits_$l").mkString(", ")}
         |FROM h ORDER BY doc_id""".stripMargin
    },
    "q31_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS INT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) /
        |      CAST(len(toks) AS DOUBLE) AS mean_tok_len,
        |    CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) /
        |      CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE) /
        |      CAST(len(toks) AS DOUBLE) AS stopword_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, mean_tok_len, punct_ratio, stopword_ratio,
        |  least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * (1.0 - punct_ratio) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "q32_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS regex_tokens,
        |  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS INT) AS distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  count(*) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS fp_count
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q113_bpe_merges" -> bpeMergesSql(BpeSteps),
    "q114_bpe_encode" -> bpeEncodeSql(BpeSteps),
    "q280_bpe_fertility" -> bpeFertilitySql(BpeSteps)
  )
}
