package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Iteration aid: count Spark jobs (≈ driver actions + AQE stage jobs) per
  * query — the bench-methodology number PLANS.md records for the iterative
  * queries, whose wall time is action-count-dominated at small sf.
  * `sbt "Test/runMain graft.JobCount q102_kmeans_assign q108_ann_pq"` */
object JobCount {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("job-count"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    args.foreach { q =>
      jobs.set(0)
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      // listener bus is async (private API): a short settle beats losing
      // trailing events — job starts precede the action's return, so at
      // most an AQE cleanup job could race this, and 500 ms covers it
      Thread.sleep(500)
      println(s"[jobcount] $q: ${jobs.get()} jobs")
    }
    spark.stop()
  }
}
