package graft

import org.apache.spark.sql.functions._

/** Round-17 driver-phase profiler for the TxLog protocol queries
  * (q323/q324/q325): StageProbe showed their stage walls sum to well
  * under the query wall (q325: 3.3 s of stages inside a 5.3 s run), so
  * the residue is DRIVER-side protocol work between jobs — this probe
  * times each protocol phase (fixture commits, DML verbs, the final
  * read) with plain nanoTime around the same calls the query makes.
  *
  * Usage: graft.TxLogPhaseProbe <sfDir> [reps]
  */
object TxLogPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val s = graft.core.GraftSession.local("txlog-phase-probe")
    s.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"    $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (1 to reps).foreach { i =>
      println(s"=== q325 shape, rep $i ===")
      val t0 = System.nanoTime()
      val table = java.nio.file.Files.createTempDirectory("probe-q325")
        .toAbsolutePath.toString
      val orders = Tables.orders(s, sfDir)
      t("create") { graft.etl.TxLog.create(table,
        org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT")) }
      t("setProperties") { graft.etl.TxLog.setProperties(table,
        Map(graft.etl.TxLog.CdfProperty -> "true")) }
      (0 until 3).foreach { p =>
        t(s"append $p") { graft.etl.TxLog.append(s, table, orders
          .filter(col("o_orderkey") % 3 === p)
          .select(col("o_orderkey"), col("o_custkey"))) }
      }
      t("updateWhere") { graft.etl.TxLog.updateWhere(s, table,
        col("o_orderkey") % 10 === 0,
        Map("o_custkey" -> (col("o_custkey") + 100L))) }
      t("deleteWhere") { graft.etl.TxLog.deleteWhere(s, table,
        col("o_orderkey") % 9 === 0) }
      t("install+cdf read") {
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
      println(f"  TOTAL ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    s.stop()
  }
}
