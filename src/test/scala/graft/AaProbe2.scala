package graft

import org.apache.spark.sql.functions._

/** Round-16 q213 probe: the StageProbe measurement showed the wedge
  * stage's map-side partial aggregate spilling 12.5 GB while deduping only
  * 5% (140.5M of 147.8M wedge rows still shuffle) — the partial agg is
  * almost pure overhead (guide §2.3 "aggregate before you shuffle" only
  * pays when it REDUCES; here it cannot, because a center's C(deg,2)
  * pairs are all distinct and pair sets of different centers barely
  * overlap). Variants:
  *
  *   A. production q213 plan (baseline);
  *   B. repartition(u, v) before the groupBy: the exchange moves RAW
  *      wedge rows and the aggregate runs once, post-shuffle, fully
  *      clustered — the spilling map-side map disappears;
  *   C. spread nb to 8× parallelism before wedge generation: the partial
  *      maps shrink 8× (no spill) but the double aggregation remains.
  */
object AaProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("aa-probe2")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val lineitem = graft.core.Tables.lineitem(spark, dir)

    def nbDf = lineitem.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"), explode(col("parts")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("dsts"))

    val term = floor(lit(1e12) /
      graft.functions.Pin.grid9(log(size(col("dsts")).cast("double")))).cast("long")

    def wedgesOf(nb: org.apache.spark.sql.DataFrame) =
      nb.filter(size(col("dsts")) >= 2)
        .select(term.as("t"), col("dsts"), posexplode(col("dsts")).as(Seq("i", "u")))
        .select(col("t"), col("u"),
          explode(expr("slice(dsts, i + 2, size(dsts))")).as("v"))

    def time(name: String)(body: => Unit): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    time("A_baseline") {
      wedgesOf(nbDf).groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
        .write.format("noop").mode("overwrite").save()
    }
    time("B_repart_uv") {
      wedgesOf(nbDf).repartition(col("u"), col("v")).groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
        .write.format("noop").mode("overwrite").save()
    }
    time("C_spread_nb") {
      val p = spark.sparkContext.defaultParallelism * 8
      wedgesOf(nbDf.repartition(p, col("src"))).groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
