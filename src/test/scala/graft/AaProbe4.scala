package graft

import org.apache.spark.sql.functions._

/** Round-16 q213 probe #3, at the DRIVER's heap (-Xmx16g): with the
  * map-side maps fixed (AaProbe3), the FINAL (u,v) aggregate still builds
  * 3.2M-group maps on 32 reduce partitions and spills 14.4 GB at 16g.
  * Variants (full query: wedge gen + anti + top-N):
  *   C      — shipped wave-1 form (nb repartitioned, planner exchange);
  *   B99    — explicit wedges.repartition(ceil(wedges/1.5M), u, v):
  *            partial+final both run post-exchange fully clustered, no
  *            aggregate map anywhere exceeds ~1.5M entries;
  *   CB99   — both repartitions.
  * Run under -Xmx16g to reproduce the driver's memory envelope.
  */
object AaProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("aa-probe4")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val lineitem = graft.core.Tables.lineitem(spark, dir)

    def full(nbTasks: Option[Int], aggTasks: Option[Int]): Unit = {
      val nb0 = graft.core.CacheScope.cached(lineitem.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
        .select(explode(col("parts")).as("src"), col("parts"))
        .select(col("src"), explode(col("parts")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"))
        .agg(sort_array(collect_set(col("dst"))).as("dsts")))
      val term = floor(lit(1e12) /
        graft.functions.Pin.grid9(log(size(col("dsts")).cast("double")))).cast("long")
      val nb = nbTasks.map(n => nb0.repartition(n, col("src"))).getOrElse(nb0)
      val w0 = nb.filter(size(col("dsts")) >= 2)
        .select(term.as("t"), col("dsts"), posexplode(col("dsts")).as(Seq("i", "u")))
        .select(col("t"), col("u"),
          explode(expr("slice(dsts, i + 2, size(dsts))")).as("v"))
      val wedges = aggTasks.map(n => w0.repartition(n, col("u"), col("v"))).getOrElse(w0)
      val scored = wedges.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
      val nonEdges = scored.join(
        nb0.select(col("src").as("u"), explode(col("dsts")).as("v")),
        Seq("u", "v"), "left_anti")
      nonEdges.orderBy(col("aa_fp").desc, col("u"), col("v")).limit(20)
        .write.format("noop").mode("overwrite").save()
    }

    def time(name: String)(body: => Unit): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    time("C_nb99    ") { full(Some(99), None) }
    time("B_agg99   ") { full(None, Some(99)) }
    time("CB_both   ") { full(Some(99), Some(99)) }
    spark.stop()
  }
}
