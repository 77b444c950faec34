package graft

import org.apache.spark.sql.functions._

/** Round-16 q213 probe #2: sweep the wedge-stage task count (AaProbe2's
  * winning variant C) to pick the per-task row target that sizes the
  * partial-aggregate map below spill (guide §5: smaller per-task state),
  * and A/B the anti-join strategy for the full query (SMJ sorts the 101M
  * scored rows; a SHUFFLE_HASH build on the 2.4M-row edge side doesn't).
  */
object AaProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("aa-probe3")
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

    def agg(tasks: Int): Unit = {
      val wedges = nbDf.repartition(tasks, col("src"))
        .filter(size(col("dsts")) >= 2)
        .select(term.as("t"), col("dsts"), posexplode(col("dsts")).as(Seq("i", "u")))
        .select(col("t"), col("u"),
          explode(expr("slice(dsts, i + 2, size(dsts))")).as("v"))
      wedges.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
        .write.format("noop").mode("overwrite").save()
    }

    def time(name: String)(body: => Unit): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    // untimed JIT warm (one small aggregate pass at 64 tasks)
    agg(64)
    Seq(64, 96, 148, 256, 512).foreach(n => time(f"tasks_$n%-4d") { agg(n) })
    spark.stop()
  }
}
