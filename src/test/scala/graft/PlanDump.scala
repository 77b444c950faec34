package graft

import org.apache.spark.sql.SparkSession

/** Iteration aid: dump the executed plan of the named queries.
  * `sbt "Test/runMain graft.PlanDump q81_group_sample q70_tfidf"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("plan-dump"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { q =>
      println(s"=== $q ===")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
        .toString.linesIterator.map(_.take(140)).take(40).mkString("\n"))
    }
    spark.stop()
  }
}
