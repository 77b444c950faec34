package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Second-moment (Gram) accumulator over integer-quantized vectors as a
  * typed `Aggregator`: one pass over the corpus produces the exact upper
  * triangle of Σ v·vᵀ plus the exact vector sum Σ v, from which mean and
  * covariance derive in closed form.
  *
  * Why an imperative aggregate and not explode+groupBy: the relational
  * formulation inflates every row into d(d+1)/2 (i,j,product) rows before
  * partial aggregation — a 2 080× scan amplification at d=64 that turns a
  * 100 TB scan into a 200 PB intermediate. This buffer does the outer
  * product in-place per row (d(d+1)/2 multiply-adds), the shuffle carries
  * ONE ~2 KB array per partition, and the merge is elementwise addition.
  *
  * DETERMINISM: inputs are integer-quantized (floor(x·2^s) longs — exact
  * in both engines since multiplying a float by a power of two only
  * shifts the exponent), so every partial sum is exact integer arithmetic:
  * the finished buffer is bit-identical at any parallelism and any row
  * order, and matches DuckDB's integer sums exactly. Overflow bound: with
  * |v| < 2^s each product is < 2^2s, so the triangle sums stay exact for
  * n < 2^(63-2s) rows (s=20 → 8M rows; drop s to trade precision for
  * headroom — s=10 covers 2^43 rows; callers pin s with their oracle).
  *
  * IN  = quantized vector (length d, longs)
  * BUF/OUT = d(d+1)/2 row-major upper-triangle product sums, then d
  *           vector sums: [g(0,0)..g(0,d-1), g(1,1)..g(1,d-1), …, s(0)..s(d-1)]
  */
class GramAggregator(d: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(d >= 1, "GramAggregator needs d >= 1")
  private val tri = d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](tri + d)

  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] = {
    require(v.length == d, s"expected vector of length $d, got ${v.length}")
    var o = 0
    var i = 0
    while (i < d) {
      val vi = v(i)
      var j = i
      while (j < d) { buf(o) += vi * v(j); j += 1; o += 1 }
      buf(tri + i) += vi
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
