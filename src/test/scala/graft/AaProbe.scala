package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off wedge-generator comparison (round 11): is q213's
  * posexplode+slice pair generation paying for the per-position tail
  * copies? Answer: NO once warm — both variants converge to ~17.3 s at
  * sf0.1 (cold pass favors double-explode 20.5 vs 27.2, i.e. slice's
  * allocation shows only before JIT/GC settle). The aggregate volume,
  * not generation idiom, is the honest cost; q213 keeps the slice form
  * whose row count is half the filtered double-explode's.
  *
  * A packed-long pair key (u << 32 | v) looked ~40% faster in one run
  * (16.6 vs 27.3 s) but the HOST was drifting 1.5-2x between runs that
  * evening (same variant measured 16.6 and 38.4 s on identical code;
  * PLANS.md r11 "machine variance") — inconclusive at the time.
  * RESOLVED on a quiet host (load <3.5, late r11): packed 54.2/32.6 s
  * vs slice 22.0/25.7 s vs dblexpl 25.0/21.6 s — the packed key never
  * beats the two-column key even warm (the 64-bit key defeats the
  * hash-aggregate's two-long fast path it was meant to help, and the
  * shift/add runs inside the exploded hot loop). The ~40% "win" was
  * host noise. q213 keeps the (u, v) slice form. */
object AaProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("aa-probe", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val lineitem = graft.core.Tables.lineitem(spark, dir)

    def baskets = lineitem.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    def nbDf = baskets
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"), explode(col("parts")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("dsts"))

    def time(name: String)(body: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val term = floor(lit(1e12) /
      graft.functions.Pin.grid9(log(size(col("dsts")).cast("double")))).cast("long")

    // variant: single packed long key for the pair aggregate
    time("packed  ") {
      val nb = nbDf
      val wedges = nb.filter(size(col("dsts")) >= 2)
        .select(term.as("t"), col("dsts"), posexplode(col("dsts")).as(Seq("i", "u")))
        .select(col("t"),
          (col("u").cast("long") * lit(1L << 32)).as("uhi"),
          explode(expr("slice(dsts, i + 2, size(dsts))")).as("v"))
        .select(col("t"), (col("uhi") + col("v")).as("uv"))
      wedges.groupBy(col("uv"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
        .write.format("noop").mode("overwrite").save()
    }
    // current: posexplode + slice
    time("slice   ") {
      val nb = nbDf
      val wedges = nb.filter(size(col("dsts")) >= 2)
        .select(term.as("t"), col("dsts"), posexplode(col("dsts")).as(Seq("i", "u")))
        .select(col("t"), col("u"),
          explode(expr("slice(dsts, i + 2, size(dsts))")).as("v"))
      wedges.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
        .write.format("noop").mode("overwrite").save()
    }

    // variant: double posexplode + j > i filter (no array copying)
    time("dblexpl ") {
      val nb = nbDf
      val wedges = nb.filter(size(col("dsts")) >= 2)
        .select(term.as("t"), col("dsts"), posexplode(col("dsts")).as(Seq("i", "u")))
        .select(col("t"), col("u"), col("i"), posexplode(col("dsts")).as(Seq("j", "v")))
        .filter(col("j") > col("i"))
        .select(col("t"), col("u"), col("v"))
      wedges.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common"), sum(col("t")).as("aa_fp"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
