package graft
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("aqe-probe", cores = 4)
    println(s"PROBE before: aqe=${spark.conf.get("spark.sql.adaptive.enabled")}")
    SparkEntry.queries("q309_txlog_native_sink")(spark, "/root/testdata/sf0.001").collect()
    println(s"PROBE after: aqe=${spark.conf.get("spark.sql.adaptive.enabled")}")
    spark.stop()
  }
}
