package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, AsOfJoin, Classify, Clustering, Curation, Datasets, Dedup, EmbeddingStats, Evaluation, Extended, Governance, Graph, Lakehouse, Mining, Multimodal, Profiling, Relational, Search, Signals, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline extensions) to a DataFrame builder; `oracleSql`
  * holds the DuckDB-equivalent SQL the driver uses as the correctness oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** Single source of truth: one (queries, oracles) pair per operator
    * module. `queries`/`oracleSql` below and ContractSpec's uniqueness
    * test all consume THIS list, so registering a new module in one place
    * cannot desync the others (the round-5 `sbt test` failure mode). */
  def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Dedup.queries, Dedup.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Similarity.queries, Similarity.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (EventsStream.queries, EventsStream.oracles),
      (AsOfJoin.queries, AsOfJoin.oracles),
      (Analytics.queries, Analytics.oracles),
      (Extended.queries, Extended.oracles),
      (Mining.queries, Mining.oracles),
      (Lakehouse.queries, Lakehouse.oracles),
      (Curation.queries, Curation.oracles),
      (Clustering.queries, Clustering.oracles),
      (Search.queries, Search.oracles),
      (Graph.queries, Graph.oracles),
      (Datasets.queries, Datasets.oracles),
      (EmbeddingStats.queries, EmbeddingStats.oracles),
      (Classify.queries, Classify.oracles),
      (Governance.queries, Governance.oracles),
      (Profiling.queries, Profiling.oracles),
      (Evaluation.queries, Evaluation.oracles),
      (Signals.queries, Signals.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
