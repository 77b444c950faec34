package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, AsOfJoin, Clustering, Curation, Dedup, Extended, Graph, Lakehouse, Mining, Multimodal, Relational, Search, Similarity, TextAnalysis}
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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dedup.queries ++ TextAnalysis.queries ++
      Similarity.queries ++ Multimodal.queries ++ EventsStream.queries ++
      AsOfJoin.queries ++ Analytics.queries ++ Extended.queries ++
      Mining.queries ++ Lakehouse.queries ++ Curation.queries ++ Clustering.queries ++
      Search.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Dedup.oracles ++ TextAnalysis.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ EventsStream.oracles ++
      AsOfJoin.oracles ++ Analytics.oracles ++ Extended.oracles ++
      Mining.oracles ++ Lakehouse.oracles ++ Curation.oracles ++ Clustering.oracles ++
      Search.oracles ++ Graph.oracles
}
