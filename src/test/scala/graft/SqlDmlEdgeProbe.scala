package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: how do subquery-bearing and other non-trivial DML
  * conditions behave through the TxLog strategy? Decides whether to
  * support, or to fail loudly, each shape. */
object SqlDmlEdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("sql-dml-edge-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dmledge").toString
    val t = s"$dir/t"
    graft.etl.TxLog.append(spark, t,
      (1L to 6L).map(i => (i, s"s$i")).toDF("id", "s"))
    graft.sources.TxLogSqlDml.install(spark)
    spark.sql(s"CREATE TABLE edge_t (id BIGINT, s STRING) USING " +
      s"graft.sources.TxLogSource OPTIONS (path '$t')")
    def probe(name: String, sql: String): Unit = {
      println(s"=== $name")
      try { spark.sql(sql); println(s"=== $name OK -> " +
        graft.etl.TxLog.read(spark, t).orderBy("id").collect().mkString(",")) }
      catch { case e: Throwable =>
        println(s"=== $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }
    }
    probe("DELETE-IN-LIST", "DELETE FROM edge_t WHERE id IN (2, 4)")
    probe("DELETE-SUBQ",
      "DELETE FROM edge_t WHERE id IN (SELECT 6L AS x)")
    probe("UPDATE-CASE",
      "UPDATE edge_t SET s = CASE WHEN id = 1 THEN 'one' ELSE s END WHERE id <= 3")
    probe("UPDATE-SELF-REF", "UPDATE edge_t SET id = id + 100 WHERE id = 5")
    spark.stop()
  }
}
