package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round stage-level profiler (guide §1/§7: decide whether a
  * slow query spends its wall in scan, shuffle write, fetch, or compute —
  * without the UI, which is disabled in this harness).
  *
  * Runs each named query REPS times (noop sink, exactly as Bench times it)
  * with a SparkListener recording per-stage: wall duration, summed task
  * time, shuffle read/write bytes and records, spill, and the stage name.
  * Prints the per-stage table of the LAST (warm) run plus per-run walls.
  *
  * Usage: graft.StageProbe <sfDir> <q1,q2,...> [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q213_adamic_adar").split(",").map(_.trim).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.core.GraftSession.local("stage-probe")
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
                  srMB: Double, swMB: Double, srRec: Long, swRec: Long,
                  spillMB: Double, inMB: Double, inRec: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(St(si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
          m.inputMetrics.bytesRead / 1e6,
          m.inputMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { qn =>
      println(s"===== $qn =====")
      (1 to reps).foreach { i =>
        stages.clear()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(qn)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[$qn] run$i wall ${wall}%.2f s")
        if (i == reps) {
          // let the async listener bus drain before reading
          Thread.sleep(1500)
          import scala.jdk.CollectionConverters._
          val tbl = stages.asScala.toSeq.sortBy(-_.taskMs)
          println(f"${"stage"}%-7s ${"wall_s"}%7s ${"task_s"}%8s ${"in_MB"}%9s ${"inRec_M"}%8s ${"sw_MB"}%8s ${"swRec_M"}%8s ${"sr_MB"}%8s ${"srRec_M"}%8s ${"spill_MB"}%9s  name")
          tbl.foreach { s =>
            println(f"${s.id}%-7d ${s.wallMs / 1e3}%7.2f ${s.taskMs / 1e3}%8.1f ${s.inMB}%9.1f ${s.inRec / 1e6}%8.2f ${s.swMB}%8.1f ${s.swRec / 1e6}%8.2f ${s.srMB}%8.1f ${s.srRec / 1e6}%8.2f ${s.spillMB}%9.1f  ${s.name}")
          }
        }
      }
    }
    spark.stop()
  }
}
