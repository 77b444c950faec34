package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Round-17: count the Spark JOBS each TxLog verb launches (q325 shape) —
  * the phase probe showed the verbs' cost is job-count × per-job floor,
  * so the lever is fewer jobs per verb, and this probe names them.
  * Usage: graft.TxLogJobCountProbe <sfDir>
  */
object TxLogJobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.GraftSession.local("txlog-jobcount-probe")
    s.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n').take(60)).getOrElse("?")
        jobs.add(s"$site | $d")
      }
    })
    def phase[A](label: String)(body: => A): A = {
      jobs.clear()
      val t0 = System.nanoTime()
      val r = body
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      println(f"-- $label (${(System.nanoTime() - t0) / 1e9}%.2f s, ${jobs.size} jobs)")
      jobs.asScala.foreach(j => println(s"     $j"))
      r
    }
    // warm one full cycle first
    val warmT = java.nio.file.Files.createTempDirectory("probe-warm").toString
    graft.etl.TxLog.create(warmT, org.apache.spark.sql.types.StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT"))
    graft.etl.TxLog.setProperties(warmT, Map(graft.etl.TxLog.CdfProperty -> "true"))
    val orders = graft.core.Tables.orders(s, sfDir)
    graft.etl.TxLog.append(s, warmT, orders.limit(100)
      .select(col("o_orderkey"), col("o_custkey")))
    graft.etl.TxLog.updateWhere(s, warmT, col("o_orderkey") % 10 === 0,
      Map("o_custkey" -> (col("o_custkey") + 100L)))
    graft.etl.TxLog.deleteWhere(s, warmT, col("o_orderkey") % 9 === 0)

    val table = java.nio.file.Files.createTempDirectory("probe-jc").toString
    graft.etl.TxLog.create(table, org.apache.spark.sql.types.StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT"))
    graft.etl.TxLog.setProperties(table, Map(graft.etl.TxLog.CdfProperty -> "true"))
    (0 until 3).foreach { p =>
      phase(s"append $p") { graft.etl.TxLog.append(s, table, orders
        .filter(col("o_orderkey") % 3 === p)
        .select(col("o_orderkey"), col("o_custkey"))) }
    }
    phase("updateWhere") { graft.etl.TxLog.updateWhere(s, table,
      col("o_orderkey") % 10 === 0,
      Map("o_custkey" -> (col("o_custkey") + 100L))) }
    phase("deleteWhere") { graft.etl.TxLog.deleteWhere(s, table,
      col("o_orderkey") % 9 === 0) }
    phase("cdf read") {
      graft.sources.TxLogSqlDml.install(s)
      s.sql(s"SELECT ${graft.etl.TxLog.ChangeTypeCol} AS change_type, " +
        "count(*) AS n_rows, sum(o_orderkey) AS sum_key, " +
        "sum(o_custkey) AS sum_cust " +
        s"FROM table_changes('$table', 1) " +
        "WHERE o_orderkey % 5 = 0 AND " +
        s"${graft.etl.TxLog.ChangeTypeCol} <> 'update_preimage' " +
        "GROUP BY 1 ORDER BY 1")
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
