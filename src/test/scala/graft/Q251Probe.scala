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

    def vocH = nh.select(col("held"), col("token")).distinct()
    def vH = vocH.groupBy(col("held")).agg(count(lit(1)).as("v"))
    def cHL = nh.groupBy(col("held"), col("lang")).agg(sum(col("nh")).as("nc"))
    def model = cHL.join(vocH, Seq("held"))
      .join(broadcast(vH), Seq("held"))
      .join(nh, Seq("held", "lang", "token"), "left")
      .select(col("held"), col("lang").as("label"), col("token"),
        graft.functions.Pin.grid9(
          log((coalesce(col("nh"), lit(0L)).cast("double") + lit(1.0)) /
            (col("nc").cast("double") + col("v").cast("double")))).as("log_lik"))
    time("model") { noop(model) }

    def evalDocs = docs.withColumn("u", u).filter(col("u") >= 0.9)
    def evTok = evalDocs
      .select(col("doc_id"), col("lang").as("truth"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy(col("doc_id"), col("truth"), col("token"))
      .agg(count(lit(1)).as("n_tok"))
    def sc = evTok.join(model, Seq("token"))
      .groupBy(col("held"), col("doc_id"), col("label"), col("truth"))
      .agg(sum(col("log_lik").cast("decimal(25,15)") *
        col("n_tok").cast("decimal(10,0)")).cast("double").as("s"))
    time("sc   ") { noop(sc) }

    def preds = sc.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("held"), col("doc_id"))
        .orderBy(col("s").desc, col("label"))))
      .filter(col("rn") === 1)
    time("preds") { noop(preds) }

    // the full output assembled with ZERO caches (priors/accuracy folded
    // in) — isolates how much of the registered query's cost is its five
    // CacheScope materialization jobs vs the computation itself
    def priors = {
      def nds = train.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("d"))
      def ndt = nds.groupBy(col("lang")).agg(sum(col("d")).as("dt"))
      broadcast(helds).crossJoin(ndt)
        .join(nds.withColumnRenamed("source", "held"), Seq("held", "lang"), "left")
        .select(col("held"), col("lang"),
          (col("dt") - coalesce(col("d"), lit(0L))).as("dh"))
        .filter(col("dh") > 0)
    }
    def predsT = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("held"), col("doc_id"))
        .orderBy(col("s").desc, col("label"))
      sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    }
    def accH = predsT.groupBy(col("held"))
      .agg(sum(when(col("label") === col("truth"), 1L).otherwise(0L))
        .as("n_correct"))
    def fullnc = {
      val nEval = evalDocs.agg(count(lit(1)).as("n_eval"))
      val a = accH.crossJoin(broadcast(nEval))
      val acc = col("n_correct").cast("double") / col("n_eval").cast("double")
      val fl = a.filter(col("held") === "__none").select(acc.as("acc_full"))
      a.filter(col("held") =!= "__none")
        .crossJoin(broadcast(fl))
        .select(col("held").as("held_source"), acc.as("accuracy"),
          col("acc_full"), (col("acc_full") - acc).as("influence"))
        .orderBy(col("held_source"))
    }
    time("fullnc") { noop(fullnc) }
    // suppress unused warning
    val _ = priors
  }
}
