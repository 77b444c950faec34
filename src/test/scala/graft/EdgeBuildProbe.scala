package graft

import org.apache.spark.sql.functions._

/** Round-16 probe: the co-purchase edge/adjacency build that opens every
  * Graph.scala query runs two ObjectHashAggregates (collect_set into
  * basket arrays, then explode², then collect_set again for adjacency) —
  * ~25-30 task-seconds per query at sf0.1. Variant: build the directed
  * pair stream with a codegen self-join of the distinct (order, part)
  * frame on the order key (lineitem is already hash-partitioned on
  * l_orderkey by the Tables spread guard, so the distinct AND the join
  * need no new exchange), and let the adjacency collect_set absorb the
  * duplicate pairs. Same edge set, one fewer OHA, join stays in codegen.
  */
object EdgeBuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("edge-probe")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val lineitem = graft.core.Tables.lineitem(spark, dir)

    // current: basket arrays + double explode
    def basketNb = lineitem.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"), explode(col("parts")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("dsts"))

    // variant: codegen self-join on the order key
    def joinNb = {
      val op = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      op.as("a").join(op.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .groupBy(col("a.pk").as("src"))
        .agg(sort_array(collect_set(col("b.pk"))).as("dsts"))
    }

    def time(name: String)(body: => Unit): Unit =
      (1 to 4).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    time("basket ") { basketNb.write.format("noop").mode("overwrite").save() }
    time("join   ") { joinNb.write.format("noop").mode("overwrite").save() }
    time("basket2") { basketNb.write.format("noop").mode("overwrite").save() }
    time("join2  ") { joinNb.write.format("noop").mode("overwrite").save() }
    // sanity: identical adjacency
    val a = basketNb.selectExpr("src", "size(dsts) d").orderBy("src")
    val b = joinNb.selectExpr("src", "size(dsts) d").orderBy("src")
    println("diff rows: " + a.exceptAll(b).count() + " / " + b.exceptAll(a).count())
    spark.stop()
  }
}
