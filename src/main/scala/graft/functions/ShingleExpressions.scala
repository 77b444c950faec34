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
  * public algorithm): rolling polynomial hash over character k-grams of the
  * normalized text, then the minimum hash of each sliding window of w
  * consecutive k-gram hashes is selected (rightmost-min tiebreak). Output:
  * sorted distinct selected hashes — a position-robust fingerprint set whose
  * overlap measures near-duplication. O(len) per row, array<long> out.
  */
case class WinnowedFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    // normalize: lowercase, collapse whitespace runs to single space
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
    // rolling hash per k-gram
    val nGrams = s.length - k + 1
    val hs = new Array[Long](nGrams)
    var h = 0L; var pow = 1L
    var j = 0
    while (j < k) { h = h * Base + s.charAt(j); if (j < k - 1) pow *= Base; j += 1 }
    hs(0) = h
    var p = 1
    while (p < nGrams) {
      h = (h - s.charAt(p - 1) * pow) * Base + s.charAt(p + k - 1)
      hs(p) = h; p += 1
    }
    // winnow: min of each window of w hashes, rightmost-min tiebreak
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

object ShingleExpressions {
  /** ArrayData helper for tests. */
  def toSeq(a: ArrayData): Seq[Any] = a.toObjectArray(StringType).toSeq
}
