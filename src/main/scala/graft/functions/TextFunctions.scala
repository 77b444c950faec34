package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup / text-analysis operators — all composed
  * from codegen'd builtins and higher-order functions (no UDFs, SURVEY §4.3):
  * the expressions stay inside whole-stage codegen and are pushed/pruned by
  * Catalyst like any other builtin.
  */
object TextFunctions {

  /** Whitespace tokenization: `\s+` split of the trimmed text. DuckDB twin:
    * `regexp_split_to_array(trim(text), '\s+')`. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles ("a b c" strings) from a tokens column —
    * the pure-builtin (HOF) reference implementation, kept as the
    * cross-check twin for the native `WordShingles` expression (which is
    * ~30x faster: interpreted lambdas pay per-SHINGLE overhead, the
    * expression loops once per row). Empty array when the document has
    * fewer than n tokens (guards `sequence`'s descending-step surprise).
    * DuckDB twin: list comprehension over `w[i:i+n-1]`. */
  def shinglesFromTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(t) - lit(n)),
          i => concat_ws(" ", (1 to n).map(k => element_at(t, i + lit(k))): _*))))
      .otherwise(array().cast("array<string>"))

  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)


  /** Normalized-content fingerprint: md5 of lowercased, whitespace-collapsed
    * text — the canonical "document fingerprint" for near-identical layout
    * variants. DuckDB twin: `md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))`. */
  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit content fingerprint (xxhash64 of normalized text) — cheaper than
    * md5 at scale (8-byte key vs 32-char string for the dedup shuffle). */
  def contentKey64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Cross-engine 60-bit hash: the first 15 hex chars of md5 as a BIGINT
    * (always >= 0; top 4 bits clear). Every engine with md5 computes the
    * identical value — DuckDB twin:
    * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)` — which makes
    * hash-dependent operators (SimHash, winnowing) oracle-checkable
    * bit-for-bit. Use xxhash64 instead when no cross-engine oracle is
    * needed (one codegen'd pass vs md5's digest + hex + parse). */
  def h60(x: Column): Column =
    conv(substring(md5(x), 1, 15), 16, 10).cast("long")
}
