package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Count-min sketch (Cormode & Muthukrishnan 2005, public) as a typed
  * `Aggregator`: a depth×width grid of counters; every occurrence
  * increments one counter per row, and a point estimate is the MIN over
  * its row counters — always an overestimate, with error ≤ εN (ε = e/width)
  * at probability 1 − e^−depth.
  *
  * Why this beats exact token counts at 100 TB: the exact count's shuffle
  * is token-keyed (vocab-sized — fine) but its INPUT is every occurrence;
  * the sketch's partial state is a FIXED depth×width long grid per
  * partition (32 KB at 4×1024) merged by elementwise add, so the shuffle
  * carries one small grid per partition regardless of corpus size, and the
  * sketch is incrementally mergeable across shards/days (union == merged
  * grids, spec-pinned). The price is overcounting from bucket collisions —
  * which the q129 query surfaces explicitly against the exact counts.
  *
  * DETERMINISM: counter sums are longs (commutative, order-free), bucket
  * ids ride the cross-engine h60 md5 prefix — DuckDB rebuilds the exact
  * grid cells from first principles.
  *
  * IN  = packed bucket ids: row r's bucket in bits [16r, 16r+16) (width
  *       ≤ 65536; the hashing itself is scan-local codegen'd md5 — see
  *       Datasets.cmsPackedBuckets)
  * BUF/OUT = row-major depth×width counter grid
  */
class CmsAggregator(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 4, "packed input carries ≤ 4 16-bit rows")
  require(width >= 2 && width <= 65536, "bucket must fit 16 bits")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], packed: Long): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + ((packed >>> (r * 16)) & 0xffffL).toInt) += 1L
      r += 1
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
