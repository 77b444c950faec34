package graft

import org.apache.spark.sql.SparkSession

/** Subprocess body for the CROSS-PROCESS OCC storm
  * ([[TxLogProcessStormSpec]]): a separate JVM racing real commits on one
  * table, so the CAS protocol is pinned at its actual isolation boundary
  * (link(2) on a shared filesystem), not just across threads of one JVM.
  *
  * Args: `<table> <writerId> <nAppends> <mode>` where mode is `append`
  * (blind appends only) or `mixed` (appends interleaved with optimize and
  * a retention-windowed vacuum — the stage-race case the vacuum mtime
  * guard exists for). Each append carries rows (writerId*1000 + i) so the
  * parent can verify every committed row survived exactly once. Exits 0
  * on success; any exception exits nonzero. */
object TxLogStormProc {
  def main(args: Array[String]): Unit = {
    val Array(table, writerIdS, nS, mode) = args
    val writerId = writerIdS.toLong
    val n = nS.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName(s"txlog-storm-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      (0 until n).foreach { i =>
        val id = writerId * 1000L + i
        mode match {
          case "append" =>
            graft.etl.TxLog.append(spark, table,
              Seq(id).toDF("id").coalesce(1))
          case "mixed" =>
            graft.etl.TxLog.append(spark, table,
              Seq(id).toDF("id").coalesce(1))
            if (i % 2 == 1) {
              graft.etl.TxLog.optimize(spark, table, targetFiles = 1)
              // default retention window: young staged files must survive
              // a concurrent writer's stage->commit gap
              graft.etl.TxLog.vacuum(table, retainVersions = 2)
            }
          // partitioned twin: the flattened hive-stage write path under
          // real cross-JVM contention, plus a partition-scoped optimize
          case "part-append" =>
            graft.etl.TxLog.append(spark, table,
              Seq((id, s"p${id % 2}")).toDF("id", "part").coalesce(1),
              partitionBy = Seq("part"))
          case "part-mixed" =>
            graft.etl.TxLog.append(spark, table,
              Seq((id, s"p${id % 2}")).toDF("id", "part").coalesce(1),
              partitionBy = Seq("part"))
            if (i % 2 == 1) {
              graft.etl.TxLog.optimize(spark, table,
                where = Some(col("part") === "p0"))
              graft.etl.TxLog.vacuum(table, retainVersions = 2)
            }
        }
      }
    } finally spark.stop()
  }
}
