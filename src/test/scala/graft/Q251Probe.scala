package graft

import org.apache.spark.sql.functions._

/** One-off q251 stage-cost breakdown (round 11): the query's solo cost
  * (~8-10 s at sf0.1) with only ~1.2M rows through its widest join can
  * only be stage/materialization overhead — measure which piece pays.
  * Pieces are cumulative prefixes of the real plan (each includes its
  * upstream), so deltas between successive lines attribute the cost:
  *   cts    — split tag + per-(source,lang,token) counts
  *   nh     — the 21-model token-count frame (crossJoin + left join)
  *   full   — the registered query end-to-end
  * Split constants inlined (0.8 / 0.9 — the q251 oracle's literals).
  */
object Q251Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("q251-probe", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(body: => Unit): Unit = {
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        println(f"[q251probe] $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val docs = graft.core.Tables.documents(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("full ") { noop(graft.operators.Classify.q251SourceInfluence(spark, dir)) }

    val u = graft.functions.TextFunctions.h60(col("doc_id").cast("string"))
      .cast("double") / lit(1152921504606846976.0)
    def train = docs.withColumn("u", u).filter(col("u") < 0.8)
    def occ = train.select(col("source"), col("lang"),
      explode(split(trim(col("text")), "\\s+")).as("token"))
    def cts = occ.groupBy(col("source"), col("lang"), col("token"))
      .agg(count(lit(1)).as("n"))
    time("cts  ") { noop(cts) }
    def tot = cts.groupBy(col("lang"), col("token")).agg(sum(col("n")).as("nt"))
    def helds = cts.select(col("source").as("held")).distinct()
      .unionByName(spark.range(1).select(lit("__none").as("held")))
    def nh = broadcast(helds).crossJoin(tot)
      .join(cts.withColumnRenamed("source", "held"),
        Seq("held", "lang", "token"), "left")
      .select(col("held"), col("lang"), col("token"),
        (col("nt") - coalesce(col("n"), lit(0L))).as("nh"))
      .filter(col("nh") > 0)
    time("nh   ") { noop(nh) }
  }
}
