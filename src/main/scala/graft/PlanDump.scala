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
  * Plans are built and explained, not executed AS QUERIES — but some
  * builders run eager warm-up/fixture work at CONSTRUCTION time (q213's
  * stats head(), q207's per-round localCheckpoints, every TxLog fixture's
  * commits), so a dump of the full surface runs real cluster jobs for
  * those queries, not just seconds of driver-side planning (ADVICE r16
  * #1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>")
      sys.exit(2)
    }
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
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")} — " +
        "names must match SparkEntry.queries keys")
      sys.exit(2)
    }
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
