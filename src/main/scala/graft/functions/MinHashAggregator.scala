package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** MinHash signature as a typed `Aggregator` (SURVEY §4.3: "Aggregator for
  * minhash sketches") — the sketch-style alternative to the 60-min-column
  * aggregate in Dedup.minhashSignatures.
  *
  * IN  = (doc-grouped) shingle hash (long)
  * BUF = running signature: sig[i] = min over shingles of XXH64(s64, seed=i)
  * OUT = the finished signature array
  *
  * One fixed-size long array per group, merged element-wise — constant
  * memory per key, one pass over the postings, and the buffer serializes as
  * a primitive array (no per-row object churn). The hash family differs
  * from the columnar path (XXH64(s64, i) vs xxhash64(lit(i), s64)) — both
  * are valid minhash families; the LSH-verified OUTPUT pair set is what
  * must (and does, see spec) agree.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val s64 = in._2
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashLong(s64, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
