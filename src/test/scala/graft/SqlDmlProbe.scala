package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: what does stock Spark 4.1 do with DELETE/UPDATE/MERGE
  * against the TxLog DSv2 table? (Where does it fail — parse, analysis,
  * planning — and with which error class?) Drives the round-13 choice of
  * injection point for SQL DML. */
object SqlDmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("sql-dml-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dmlprobe").toString
    val t = s"$dir/t"
    graft.etl.TxLog.append(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    spark.sql(s"CREATE TABLE probe_t (id BIGINT, s STRING) USING " +
      s"graft.sources.TxLogSource OPTIONS (path '$t')")
    def probe(name: String, sql: String): Unit = {
      println(s"=== $name: $sql")
      try { spark.sql(sql).show(); println(s"=== $name OK") }
      catch { case e: Throwable =>
        println(s"=== $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        val frames = e.getStackTrace.take(12).mkString("\n  ")
        println(s"  at $frames")
      }
    }
    graft.sources.TxLogSqlDml.install(spark)
    probe("DELETE", "DELETE FROM probe_t WHERE id = 2")
    probe("UPDATE", "UPDATE probe_t SET s = 'z' WHERE id = 1")
    probe("MERGE",
      """MERGE INTO probe_t USING (SELECT 3L AS id, 'x' AS s UNION ALL
        |SELECT 9L, 'n') src ON probe_t.id = src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    println("=== FINAL TABLE")
    spark.sql("SELECT * FROM probe_t ORDER BY id").show()
    println("=== versions: " + graft.etl.TxLog.versions(t))
    // expected: id=1->'z', id=3->'x', id=9->'n' (id=2 deleted)
    spark.stop()
  }
}
