package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions

object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("explain-check")
    VectorFunctions.register(spark)
    val fp = Tables.documents(spark, dir).select(col("doc_id"),
      VectorFunctions.winnowFingerprint(col("text"), 8, 4).as("fp"))
      .filter(size(col("fp")) > 0)
    fp.explain("formatted")
    spark.stop()
  }
}
