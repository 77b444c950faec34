package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Ad-hoc A/B for q141's large-star checkpoint (iteration aid, not a test). */
object CcStarProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("ccstar-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def tick(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.lineitem(spark, dir)
    def variant(): org.apache.spark.sql.DataFrame = {
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
      val und = graft.core.CacheScope.cached(baskets
        .select(explode(col("parts")).as("a"), col("parts"))
        .select(col("a"), explode(col("parts")).as("b"))
        .filter(col("a") < col("b")).distinct())
      var edges = und.select(col("a").as("lo"), col("b").as("hi")).localCheckpoint()
      var converged = false
      var round = 0
      while (!converged && round < 20) {
        val sym = edges.select(col("lo").as("u"), col("hi").as("v"))
          .union(edges.select(col("hi").as("u"), col("lo").as("v")))
        val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        // NO checkpoint on ls: its distinct-exchange is reused by both consumers
        val ls = sym.join(mins.hint("shuffle_hash"), "u").filter(col("v") > col("u"))
          .select(least(col("mv"), col("u")).as("lo"), col("v").as("hi"))
          .distinct()
        val minsS = ls.groupBy(col("hi")).agg(min(col("lo")).as("ml"))
        val ss = ls.join(minsS.hint("shuffle_hash"), "hi").filter(col("lo") =!= col("ml"))
          .select(col("ml").as("lo"), col("lo").as("hi"))
          .union(minsS.select(col("ml").as("lo"), col("hi")))
          .distinct().localCheckpoint()
        edges = ss
        converged = ss.select(col("lo")).intersect(ss.select(col("hi"))).isEmpty
        round += 1
      }
      val nodes = und.select(col("a").as("node"))
        .union(und.select(col("b").as("node"))).distinct()
      nodes.join(edges.select(col("hi").as("node"), col("lo").as("root")),
          Seq("node"), "left")
        .groupBy(col("node")).agg(min(coalesce(col("root"), col("node"))).as("component"))
        .select(col("node").as("part"), col("component"))
        .orderBy(col("part"))
    }
    for (i <- 1 to 3) {
      tick(s"cur-$i")(graft.operators.Graph.ccStar(spark, li)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      tick(s"var-$i")(variant().write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    val a = graft.operators.Graph.ccStar(spark, li).collect().map(_.toSeq).toSeq
    val b = variant().collect().map(_.toSeq).toSeq
    println(s"[probe] equal: ${a == b}")
    spark.stop()
  }
}
