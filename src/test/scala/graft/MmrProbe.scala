package graft

import org.apache.spark.sql.functions._

/** Round-16 q207 probe: the greedy MMR unroll references round r-1's
  * `selected` inside round r, so the one-DAG plan grows ~quadratically in
  * k (dumped initial plan: 126 parquet scans, 62 Window nodes) while the
  * DATA per round is ≤ k rows per query — the cost is Catalyst analysis/
  * planning, not execution. Variant: localCheckpoint the k-row `selected`
  * each round (the q147/q191 bounded-round discipline — justified here
  * because rounds carry only |queries|·k rows, unlike the q109/q136 loops
  * whose rounds carry the corpus-scale rank frame).
  */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("mmr-probe")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val embs = graft.core.Tables.embeddings(spark, dir)

    def run(checkpoint: Boolean): Unit = {
      import graft.operators.{Similarity}
      graft.functions.VectorFunctions.register(spark)
      val k = 5; val shortlist = 30; val lambda = 0.7
      val cand = graft.core.CacheScope.cached(
        Similarity.bruteForceTopK(spark, embs, k = shortlist)
          .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel"))
          .join(embs.select(col("vec_id").as("neighbor_id"), col("embedding")),
            Seq("neighbor_id")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("mmr").desc, col("neighbor_id"))
      var selected = cand.withColumn("mmr", col("rel"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rel"), col("mmr"),
          lit(1).as("rank"), col("embedding"))
      if (checkpoint) selected = selected.localCheckpoint()
      for (r <- 2 to k) {
        val pen = cand.as("c")
          .join(selected.select(col("query_id"), col("neighbor_id").as("sid"),
            col("embedding").as("semb")), Seq("query_id"))
          .groupBy(col("query_id"), col("c.neighbor_id"), col("c.rel"))
          .agg(max(graft.functions.VectorFunctions.cosineSim(col("c.embedding"), col("semb")))
              .as("pen"),
            max(when(col("c.neighbor_id") === col("sid"), 1L).otherwise(0L))
              .as("taken"))
          .filter(col("taken") === 0L)
        val pick = pen
          .withColumn("mmr", lit(lambda) * col("rel") - lit(1.0 - lambda) * col("pen"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .join(embs.select(col("vec_id").as("neighbor_id"), col("embedding")),
            Seq("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"), col("rel"), col("mmr"),
            lit(r).as("rank"), col("embedding"))
        selected = selected.unionAll(pick)
        if (checkpoint) selected = selected.localCheckpoint()
      }
      selected.select(col("query_id"), col("rank"), col("neighbor_id"),
          col("rel"), col("mmr"))
        .orderBy(col("query_id"), col("rank"))
        .write.format("noop").mode("overwrite").save()
    }

    def time(name: String)(body: => Unit): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("current ") { run(false) }
    time("ckpt    ") { run(true) }
    time("current2") { run(false) }
    time("ckpt2   ") { run(true) }
    spark.stop()
  }
}
