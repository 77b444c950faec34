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

object ShingleExpressions {
  /** ArrayData helper for tests. */
  def toSeq(a: ArrayData): Seq[Any] = a.toObjectArray(StringType).toSeq
}
