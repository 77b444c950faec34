package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.core.Tables

object WinnowDfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("winnow-df-probe")
    val docs = Tables.documents(spark, dir)
    for (cap <- Seq(50, 20, 10, 5)) {
      val t0 = System.nanoTime()
      val n = Dedup.winnowPairs(docs, maxDf = cap).count()
      println(f"[probe] maxDf=$cap%-3d pairs=$n%-6d ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
