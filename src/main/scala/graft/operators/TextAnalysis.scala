package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions

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

  // --------------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_text_chunks" -> ((s, d) => chunk(Tables.documents(s, d))),
    "q43_top_terms" -> ((s, d) => topTerms(Tables.documents(s, d))),
    "q30_text_langid" -> ((s, d) => langId(Tables.documents(s, d))),
    "q31_text_quality" -> ((s, d) => quality(Tables.documents(s, d))),
    "q32_text_tokens" -> ((s, d) => tokenCounts(Tables.documents(s, d))),
    "q33_text_fingerprint" -> ((s, d) => fingerprints(Tables.documents(s, d)))
  )

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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
