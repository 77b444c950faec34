package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.operators.Dedup
import graft.functions.TextFunctions

object MinhashProbe {
  def t[A](label: String)(f: => A): A = {
    var best = Double.MaxValue; var r: A = null.asInstanceOf[A]
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime(); r = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"[probe] $label%-28s $best%8.2f s (min of 3)"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", 32)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1").cache()
    docs.count()
    val shStr = Dedup.shingled(docs)
    t("shingle strings")(shStr.write.format("noop").mode("overwrite").save())
    val sh64 = Dedup.shingledHashed(docs).cache()
    t("shingle hashed + cache")(sh64.count())
    val sig = Dedup.minhashSignatures(sh64, 60)
    t("signatures 60")(sig.write.format("noop").mode("overwrite").save())
    val sig2 = Dedup.minhashSignatures(sh64, 16)
    t("signatures 16")(sig2.write.format("noop").mode("overwrite").save())
    val full = Dedup.minhashPairs(docs)
    t("full minhashPairs")(full.write.format("noop").mode("overwrite").save())
    val posting = sh64.select(col("doc_id"), explode(col("sh")).as("s64"))
    t("posting explode only")(posting.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
