package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Ad-hoc phase timing for q109 (iteration aid, not a test). */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("pagerank-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def tick[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, dir)
    val baskets = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    val edges = baskets
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"), explode(col("parts")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    val edgesDeg = edges.join(degrees, "src").cache()
    val nEdges = tick("edges build+cache")(edgesDeg.count())
    println(s"[probe] edges: $nEdges")
    val n = tick("degrees count")(degrees.count())
    val base = 0.15 / n
    var ranks = degrees.select(col("src").as("node"), lit(1.0 / n).as("pagerank"))
    for (i <- 1 to 5) {
      ranks = tick(s"round $i") {
        edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
          .select(col("dst"),
            (col("pagerank") / col("degree").cast("double")).as("contrib"))
          .groupBy(col("dst"))
          .agg((lit(base) + lit(0.85) *
            (sum(floor(col("contrib") * lit(1e18))).cast("double") / lit(1e18)))
            .as("pagerank"))
          .select(col("dst").as("node"), col("pagerank"))
          .localCheckpoint()
      }
    }
    tick("final sort+noop") {
      ranks.select(col("node").as("part"), col("pagerank")).orderBy(col("part"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
