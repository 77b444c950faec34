package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Ad-hoc phase timing for q147 (iteration aid, not a test). */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("bfs-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def tick(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.lineitem(spark, dir)
    for (i <- 1 to 2) {
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
      val sym = baskets
        .select(explode(col("parts")).as("src"), col("parts"))
        .select(col("src"), explode(col("parts")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      tick(s"sym-count-$i")(println("  sym rows " + sym.count()))
      val c = sym.cache()
      tick(s"sym-cache-$i")(println("  sym rows " + c.count()))
      tick(s"full-bfs-$i")(graft.operators.Graph.bfsHops(spark, li)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
