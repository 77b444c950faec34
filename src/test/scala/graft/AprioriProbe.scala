package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Ad-hoc phase timing for q145 (iteration aid, not a test). */
object AprioriProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("apriori-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def tick(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.lineitem(spark, dir)
    val or = Tables.orders(spark, dir)
    for (i <- 1 to 3) {
      tick(s"full-$i")(graft.operators.Mining.aprioriTriples(spark, li, or)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    // phase split
    val d = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("k"), col("l_partkey").as("p")).distinct()
    tick("d-count")(println("  d rows " + d.count()))
    val baskets = d.groupBy(col("k")).agg(sort_array(collect_set(col("p"))).as("ps"))
    val pairInst = baskets
      .select(col("k"), explode(col("ps")).as("pa"), col("ps"))
      .select(col("k"), col("pa"), explode(col("ps")).as("pb"))
      .filter(col("pa") < col("pb"))
    tick("pairInst-count")(println("  pairInst rows " + pairInst.count()))
    val freqPairs = pairInst.groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 3).select(col("pa"), col("pb"))
    tick("freqPairs-count")(println("  freqPairs rows " + freqPairs.count()))
    spark.stop()
  }
}
