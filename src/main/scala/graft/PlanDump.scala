package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid: dump `.explain("formatted")` for a
  * set of declared queries to text files (guide §1: capture the plan shape
  * — Exchange count, join strategy, PushedFilters/ReadSchema — before and
  * after each change; the judge checks plan claims against these files).
  *
  * Usage: graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>
  *
  * Writes <outDir>/<name>_<suffix>.txt containing the formatted physical
  * plan of the query's noop-write build (the exact frame Bench times).
  * Plans are built and explained only — nothing executes, so a dump of the
  * full surface is driver-side work measured in seconds.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, sel) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-plandump"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val names =
      if (sel == "all") SparkEntry.queries.keys.toSeq.sorted
      else sel.split(",").map(_.trim).toSeq
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] $name ok (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
