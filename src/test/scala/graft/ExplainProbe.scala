package graft

import graft.core.GraftSession

/** Dump formatted physical plans for plan review. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("explain", 8)
    val sf = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_filter_project", "q03_top_revenue",
      "q11_star_fact", "q21_dedup_jaccard", "q25_ann_brute")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
