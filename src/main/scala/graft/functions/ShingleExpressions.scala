package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as native Catalyst expressions.
  *
  * The higher-order-function formulation (transform + sequence + concat_ws,
  * TextFunctions.shinglesFromTokens) pays interpreted-lambda overhead PER
  * SHINGLE (~20us each — measured ~9s for 400k shingles over 5k docs); these
  * expressions run one tight JVM loop PER ROW (~50x faster), which is the
  * difference between a scan-bound and an expression-bound dedup pass at
  * corpus scale. Output order = first occurrence, same as array_distinct.
  */
abstract class ShingleBase extends UnaryExpression with CodegenFallback {
  def n: Int
  override def nullIntolerant: Boolean = true

  protected def splitTokens(input: Any): Array[String] =
    input.asInstanceOf[UTF8String].toString.trim.split("\\s+")

  protected def distinctShingles(toks: Array[String]): java.util.LinkedHashSet[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }
}

/** array<string> of distinct word n-grams ("a b c"). Set-equal to the
  * DuckDB oracle's list-comprehension shingles. */
case class WordShingles(child: Expression, n: Int) extends ShingleBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = splitTokens(input)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = distinctShingles(toks)
      val out = new Array[Any](seen.size)
      val it = seen.iterator(); var i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> of distinct xxhash64'd word n-grams — the MinHash input form;
  * no shingle strings are retained. */
case class HashedWordShingles(child: Expression, n: Int) extends ShingleBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = splitTokens(input)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = distinctShingles(toks)
      val out = new Array[Any](seen.size)
      val it = seen.iterator(); var i = 0
      while (it.hasNext) {
        out(i) = java.lang.Long.valueOf(
          XXH64.hashUTF8String(UTF8String.fromString(it.next()), 42L))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * public algorithm): hash each character k-gram of the normalized text,
  * then the minimum hash of each sliding window of w consecutive k-gram
  * hashes is selected. Output: sorted distinct selected hashes — a
  * position-robust fingerprint set whose overlap measures near-duplication.
  *
  * The k-gram hash is the cross-engine md5-derived 60-bit value
  * (TextFunctions.h60 semantics: first 15 md5 hex chars as a long), NOT a
  * rolling polynomial: md5 costs more per gram but makes the whole operator
  * reproducible in any engine with md5 — the DuckDB oracle recomputes
  * identical fingerprints from `substr`+`md5`. O(len) per row, one tight
  * loop, array<long> out.
  */
case class WinnowedFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    // normalize: lowercase, collapse whitespace runs to single space —
    // equals regexp_replace(lower(trim(s)), '\s+', ' ', 'g') on ASCII
    val raw = input.asInstanceOf[UTF8String].toString.toLowerCase
    val sb = new java.lang.StringBuilder(raw.length)
    var prevSpace = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isWhitespace(c)) { if (!prevSpace && sb.length > 0) sb.append(' '); prevSpace = true }
      else { sb.append(c); prevSpace = false }
      i += 1
    }
    val s = sb.toString.stripTrailing()
    if (s.length < k) return new GenericArrayData(Array.empty[Any])
    val nGrams = s.length - k + 1
    val hs = new Array[Long](nGrams)
    val md = WinnowedFingerprint.digest.get()
    // one UTF-8 encode for the whole row; ASCII (the common case after
    // normalization) digests k-byte windows in place — no per-gram
    // substring/getBytes allocation. Multi-byte text falls back to
    // per-gram char-substring encoding (k CHARS, matching SQL substr).
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ascii = bytes.length == s.length
    var p = 0
    while (p < nGrams) {
      md.reset()
      if (ascii) md.update(bytes, p, k)
      else md.update(s.substring(p, p + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      // first 15 hex chars of the md5 = big-endian first-8-bytes >>> 4
      var l = 0L
      var b = 0
      while (b < 8) { l = (l << 8) | (d(b) & 0xffL); b += 1 }
      hs(p) = l >>> 4
      p += 1
    }
    // winnow: min of each window of w hashes (set output — ties collapse)
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var m = hs(0); var mi = 0; var q = 1
      while (q < nGrams) { if (hs(q) <= m) { m = hs(q); mi = q }; q += 1 }
      selected.add(m)
    } else {
      var q = 0
      while (q + w <= nGrams) {
        var m = hs(q); var x = q + 1
        while (x < q + w) { if (hs(x) <= m) m = hs(x); x += 1 }
        selected.add(m)
        q += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator(); var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedFingerprint {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

object ShingleExpressions {
  /** ArrayData helper for tests. */
  def toSeq(a: ArrayData): Seq[Any] = a.toObjectArray(StringType).toSeq
}
