package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
abstract class ShingleBase extends UnaryExpression {
  def n: Int
  override def nullIntolerant: Boolean = true
}

/** Static shingling kernels, shared by interpreted eval and generated code
  * (the codegen path emits one static call — the surrounding operators
  * stay inside WholeStageCodegen instead of falling back to the
  * interpreted-projection path CodegenFallback forces). */
object ShingleCompute {
  private def splitTokens(input: UTF8String): Array[String] =
    input.toString.trim.split("\\s+")

  private def distinctShingles(toks: Array[String], n: Int): java.util.LinkedHashSet[String] = {
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

  def wordShingles(input: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(input)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = distinctShingles(toks, n)
      val out = new Array[Any](seen.size)
      val it = seen.iterator(); var i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** ALL word n-grams in document order, WITH multiplicity (unlike
    * wordShingles' distinct set) — the language-model counting form.
    * Tokenization identical to TextFunctions.tokens (trim + \s+ split),
    * so `explode(word_ngram_list(text, 2))` ≡ the posexplode + per-doc
    * lead() window bigram construction, minus the doc_id shuffle + sort
    * the window needs: n-gram assembly becomes scan-local. */
  def wordNgramList(input: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(input)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def hashedWordShingles(input: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(input)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = distinctShingles(toks, n)
      val hs = new Array[Long](seen.size)
      val it = seen.iterator(); var i = 0
      while (it.hasNext) {
        hs(i) = XXH64.hashUTF8String(UTF8String.fromString(it.next()), 42L)
        i += 1
      }
      java.util.Arrays.sort(hs)
      val out = new Array[Any](hs.length)
      i = 0
      while (i < hs.length) { out(i) = java.lang.Long.valueOf(hs(i)); i += 1 }
      new GenericArrayData(out)
    }
  }
}

/** array<string> of distinct word n-grams ("a b c"). Set-equal to the
  * DuckDB oracle's list-comprehension shingles. */
case class WordShingles(child: Expression, n: Int) extends ShingleBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleCompute.wordShingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleCompute.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> of ALL word n-grams in order, with multiplicity — the
  * LM-counting twin of WordShingles. */
case class WordNgramList(child: Expression, n: Int) extends ShingleBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleCompute.wordNgramList(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleCompute.wordNgramList($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> of SORTED distinct xxhash64'd word n-grams — the MinHash
  * input form; no shingle strings are retained. Sorted ascending so pair
  * verification can use the allocation-free `SortedIntersectCount` merge
  * walk instead of array_intersect's per-row hash set; every consumer
  * (min-per-hash signatures, posting explode, set intersection) is
  * order-independent. */
case class HashedWordShingles(child: Expression, n: Int) extends ShingleBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleCompute.hashedWordShingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleCompute.hashedWordShingles($c, $n);")

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
    extends UnaryExpression {
  require(k >= 2 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowedFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowedFingerprint.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedFingerprint {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String, k: Int, w: Int): ArrayData = {
    // normalize: lowercase, collapse whitespace runs to single space —
    // equals regexp_replace(lower(trim(s)), '\s+', ' ', 'g') on ASCII
    val raw = input.toString.toLowerCase
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
    // one UTF-8 encode for the whole row; ASCII (the common case after
    // normalization) with k == 8 hashes each window with the inlined
    // single-block MD5 compress — zero allocation per gram. Other shapes
    // fall back to MessageDigest over the k-CHAR substring (matching SQL
    // substr semantics for multi-byte text).
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val fast = bytes.length == s.length && k == 8
    var p = 0
    while (p < nGrams) {
      hs(p) =
        if (fast)
          WinnowedFingerprint.md5h60of8(
            (bytes(p) & 0xff) | (bytes(p + 1) & 0xff) << 8 |
              (bytes(p + 2) & 0xff) << 16 | (bytes(p + 3) & 0xff) << 24,
            (bytes(p + 4) & 0xff) | (bytes(p + 5) & 0xff) << 8 |
              (bytes(p + 6) & 0xff) << 16 | (bytes(p + 7) & 0xff) << 24)
        else {
          val md = WinnowedFingerprint.digest.get()
          md.reset()
          md.update(s.substring(p, p + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val d = md.digest()
          // first 15 hex chars of the md5 = big-endian first-8-bytes >>> 4
          var l = 0L
          var b = 0
          while (b < 8) { l = (l << 8) | (d(b) & 0xffL); b += 1 }
          l >>> 4
        }
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

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // RFC 1321 per-step constants (floor(abs(sin(i+1)) * 2^32)) and rotations.
  private val K: Array[Int] = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  /** MD5 of an exactly-8-byte message, returned as the engine's 60-bit hash
    * (first 15 md5 hex chars as a long — see TextFunctions.h60). For an
    * 8-byte input the padded block is fully determined at compile time
    * (msg || 0x80 || zeros || bitlen=64 LE), so this is ONE compress call
    * with zero allocation — RFC 1321, public algorithm. Verified against
    * java.security.MessageDigest in ExtensionsSpec. */
  def md5h60of8(w0: Int, w1: Int): Long = {
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      // block words: w0, w1 = message; w2 = 0x80 pad; w14 = 64-bit length LE
      val m = g match {
        case 0 => w0
        case 1 => w1
        case 2 => 0x80
        case 14 => 64
        case _ => 0
      }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m, S(i))
      a = tmp
      i += 1
    }
    val ha = a + 0x67452301
    val hb = b + 0xefcdab89
    // digest bytes 0-7 are LE(ha) || LE(hb); big-endian long of them >>> 4
    ((Integer.reverseBytes(ha).toLong << 32) |
      (Integer.reverseBytes(hb).toLong & 0xffffffffL)) >>> 4
  }
}

/** Count of common elements of two SORTED DISTINCT array<long> columns via
  * one merge walk — the verification kernel for fingerprint-set overlap.
  * `array_intersect` builds a hash set per ROW (and materializes the
  * intersection array just to take its size); on pre-sorted fingerprint
  * sets the merge walk is allocation-free. Both inputs MUST be sorted
  * ascending and duplicate-free (WinnowedFingerprint emits exactly that). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $acc++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleExpressions {
  /** ArrayData helper for tests. */
  def toSeq(a: ArrayData): Seq[Any] = a.toObjectArray(StringType).toSeq
}
