package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** KMV (k-minimum-values) distinct-count sketch as a typed `Aggregator`
  * (Bar-Yossef et al. 2002, public): keep the k smallest DISTINCT hash
  * values seen; with hashes uniform on [0, 2^60), the k-th smallest value
  * estimates the distinct count as (k-1) / (h_(k) / 2^60).
  *
  * Why an imperative aggregate and not `countDistinct`: exact distinct
  * shuffles the full distinct key set (vocab-bounded, but at 100 TB that
  * is the corpus); this buffer is ≤ k longs per group — partial
  * aggregation does ALL the heavy lifting map-side, the merge is a
  * k-bounded sorted-array union, and the shuffle carries k longs per
  * (partition, group). Mergeability also makes the sketch incremental:
  * union of per-shard sketches == sketch of the union (spec-pinned).
  *
  * DETERMINISM: the buffer is the k smallest distinct values — a pure SET
  * property, independent of row order and partitioning, so the finished
  * sketch (and any estimate derived from it) is bit-identical across
  * engines given the same hash column (h60: the cross-engine 60-bit md5
  * prefix, TextFunctions.h60).
  *
  * IN  = h60 hash (long, non-negative)
  * BUF = sorted ascending array of ≤ k distinct hashes
  * OUT = the finished sketch array
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, "KMV needs k >= 2")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == k && h >= buf(n - 1)) return buf // too large to enter a full sketch
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present (distinct semantics)
    val ins = -pos - 1
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // sorted-union the two ≤k arrays, dropping duplicates, keep k smallest
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
