package graft

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** Cross-SF sanity: minhash recall and winnow precision at sf0.1. */
object CrossSfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("crosssf", 16)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, sf)
      val exact = Dedup.jaccardPairs(docs).select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val mh = Dedup.minhashPairs(docs).select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val wn = Dedup.winnowPairs(docs).select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[crosssf] $sf exact=${exact.size} minhash=${mh.size} " +
        s"mh_missed=${exact.diff(mh).size} mh_extra=${mh.diff(exact).size} " +
        s"winnow=${wn.size} wn_missed=${exact.diff(wn).size}")
    }
    spark.stop()
  }
}
