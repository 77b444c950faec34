package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions

/** Dev-only stage profiler for the winnow pipeline (not part of the driver
  * contract; run with SPARK_GRAFT_SF_DIR to point at a scale factor). */
object ProfileQ34 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("profile-q34"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    time("warm: docs count")(docs.count())

    (1 to 2).foreach { pass =>
      println(s"-- pass $pass --")
      val fp = docs.select(col("doc_id"),
        VectorFunctions.winnowFingerprint(col("text"), 8, 4).as("fp"))
        .filter(size(col("fp")) > 0)
        .cache()
      time("fingerprint (cache fill)")(fp.count())
      val posting = fp.select(col("doc_id"), explode(col("fp")).as("h"))
      time("posting explode count")(posting.count())
      val rare = posting.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select(col("h"))
      time("rare df")(rare.count())
      val rarePosting = posting.join(broadcast(rare), "h")
      val cand = rarePosting.as("a")
        .join(rarePosting.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      time("candidates distinct")(println("  cand=" + cand.count()))
      val out = cand
        .join(fp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")), "doc_a")
        .join(fp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")), "doc_b")
        .withColumn("shared_fp",
          VectorFunctions.sortedIntersectCount(col("fp_a"), col("fp_b")))
        .withColumn("overlap",
          col("shared_fp").cast("double") /
            least(size(col("fp_a")), size(col("fp_b"))).cast("double"))
        .filter(col("overlap") >= 0.6)
        .select(col("doc_a"), col("doc_b"), col("shared_fp"), col("overlap"))
        .orderBy(col("doc_a"), col("doc_b"))
      time("verify+sort")(out.write.format("noop").mode("overwrite").save())
      fp.unpersist()
    }
    spark.stop()
  }
}
