package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.functions.VectorFunctions

/** One-off phase timing for the winnow operator at a given SF dir. */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("winnow-profile", 32)
    VectorFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fp = docs.select(col("doc_id"),
      VectorFunctions.winnowFingerprint(col("text"), 8, 4).as("fp"))
      .filter(size(col("fp")) > 0).cache()
    t("fingerprint+cache")(fp.count())
    val posting = fp.select(col("doc_id"), explode(col("fp")).as("h"))
    val rare = posting.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select(col("h"))
    val rarePosting = posting.join(broadcast(rare), "h")
    val cand = rarePosting.as("a")
      .join(rarePosting.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().cache()
    t("candidates+cache")(cand.count())
    val out = t("verify") {
      cand
        .join(fp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")), "doc_a")
        .join(fp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")), "doc_b")
        .withColumn("shared_fp", size(array_intersect(col("fp_a"), col("fp_b"))).cast("bigint"))
        .withColumn("overlap", col("shared_fp").cast("double") /
          least(size(col("fp_a")), size(col("fp_b"))).cast("double"))
        .filter(col("overlap") >= 0.6).count()
    }
    println(s"[profile] pairs=$out")
    spark.stop()
  }
}
