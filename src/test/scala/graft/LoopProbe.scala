package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Ad-hoc A/B for the iterative-loop execution strategy (iteration aid,
  * not a test): per-round localCheckpoint (current) vs one-DAG
  * shuffle-hash loop relying on ReusedExchange across rounds. */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("loop-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def tick(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.lineitem(spark, dir)
    val or = Tables.orders(spark, dir)

    def lpVariant(): DataFrame = {
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
      val und = baskets.select(explode(col("parts")).as("src"), col("parts"))
        .select(col("src"), explode(col("parts")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val nodes = und.select(col("src").as("v")).distinct()
      val edges = und
        .union(nodes.select(col("v").as("src"), col("v").as("dst"))).distinct()
      var labels = nodes.select(col("v").as("node"), col("v").as("lbl"))
      for (_ <- 1 to 4) {
        labels = edges.join(labels.hint("shuffle_hash"),
            edges("src") === labels("node"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("lbl"))
          .select(col("dst").as("node"), col("lbl"))
      }
      labels.select(col("node").as("part"), col("lbl").as("community"))
        .orderBy(col("part"))
    }

    def prVariant(): DataFrame = {
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
      val pairs = baskets
        .select(explode(col("parts")).as("src"), col("parts"))
        .select(col("src"), explode(col("parts")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val edgesDeg = graft.core.CacheScope.cached(pairs.groupBy(col("src"))
        .agg(collect_set(col("dst")).as("dsts"))
        .select(col("src"), size(col("dsts")).cast("long").as("degree"),
          explode(col("dsts")).as("dst")))
      val nodes = edgesDeg.select(col("src")).distinct()
      val n = nodes.count()
      val base = (1.0 - 0.85) / n
      var ranks = nodes.select(col("src").as("node"), lit(1.0 / n).as("pagerank"))
      for (_ <- 1 to 5) {
        ranks = edgesDeg.join(ranks.hint("shuffle_hash"),
            edgesDeg("src") === ranks("node"))
          .select(col("dst"),
            (col("pagerank") / col("degree").cast("double")).as("contrib"))
          .groupBy(col("dst"))
          .agg((lit(base) + lit(0.85) *
            (sum(floor(col("contrib") * lit(1e18))).cast("double") / lit(1e18)))
            .as("pagerank"))
          .select(col("dst").as("node"), col("pagerank"))
      }
      ranks.select(col("node").as("part"), col("pagerank")).orderBy(col("part"))
    }

    def hitsVariant(): DataFrame = {
      val edges = graft.core.CacheScope.cached(
        li.join(or, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .distinct())
      var hub = edges.select(col("c")).distinct()
        .select(col("c"), lit(1).cast("decimal(38,0)").as("h"))
      var auth = hub.limit(0).select(col("c").as("p"), col("h").as("a"))
      for (_ <- 1 to 2) {
        auth = edges.join(hub.hint("shuffle_hash"), Seq("c"))
          .groupBy(col("p")).agg(sum(col("h")).cast("decimal(38,0)").as("a"))
        hub = edges.join(auth.hint("shuffle_hash"), Seq("p"))
          .groupBy(col("c")).agg(sum(col("a")).cast("decimal(38,0)").as("h"))
      }
      val mx = auth.agg(max(col("a")).as("m"))
      auth.crossJoin(broadcast(mx))
        .orderBy(col("a").desc, col("p"))
        .limit(50)
        .select(col("p").as("part"),
          col("a").cast("double").as("authority"),
          (col("a").cast("double") / col("m").cast("double")).as("authority_norm"))
    }

    def bfsVariant(): DataFrame = {
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
      val sym = graft.core.CacheScope.cached(baskets
        .select(explode(col("parts")).as("src"), col("parts"))
        .select(col("src"), explode(col("parts")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
      val seeds = sym.select(col("src").as("node")).distinct()
        .orderBy(col("node")).limit(5)
      var dist = seeds.select(col("node"), lit(0L).as("dist"))
      for (r <- 1 to 4) {
        val frontier = dist.filter(col("dist") === lit((r - 1).toLong))
        val cand = sym.join(frontier.hint("shuffle_hash"),
            sym("src") === frontier("node"))
          .select(col("dst").as("node"), lit(r.toLong).as("dist"))
        dist = dist.union(cand)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      }
      dist.select(col("node").as("part"), col("dist")).orderBy(col("part"))
    }

    for (i <- 1 to 3) {
      tick(s"lp-cur-$i")(noop(graft.operators.Graph.labelPropagation(spark, li)))
      tick(s"lp-var-$i")(noop(lpVariant()))
      tick(s"pr-cur-$i")(noop(graft.operators.Graph.pagerank(spark, li)))
      tick(s"pr-var-$i")(noop(prVariant()))
      tick(s"hits-cur-$i")(noop(graft.operators.Graph.hits(spark, li, or)))
      tick(s"hits-var-$i")(noop(hitsVariant()))
      tick(s"bfs-cur-$i")(noop(graft.operators.Graph.bfsHops(spark, li)))
      tick(s"bfs-var-$i")(noop(bfsVariant()))
      spark.catalog.clearCache()
    }
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq
    println(s"[probe] lp equal: ${rows(graft.operators.Graph.labelPropagation(spark, li)) == rows(lpVariant())}")
    println(s"[probe] pr equal: ${rows(graft.operators.Graph.pagerank(spark, li)) == rows(prVariant())}")
    println(s"[probe] hits equal: ${rows(graft.operators.Graph.hits(spark, li, or)) == rows(hitsVariant())}")
    println(s"[probe] bfs equal: ${rows(graft.operators.Graph.bfsHops(spark, li)) == rows(bfsVariant())}")
    spark.stop()
  }
}
