package graft

import graft.core.GraftSession
import graft.etl._

/** Example entry point: run the full NeoWs medallion pipeline from a landed
  * bronze document and answer the reference's demo query
  * (`/root/reference/src/gold_catalog.py:80-84`).
  *
  * Usage: runMain graft.Demo <bronze.json> <warehouseDir> [processingDate]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val bronze = args(0)
    val warehouse = args(1)
    val processingDate =
      if (args.length > 2) args(2) else java.time.LocalDate.now().toString
    val spark = GraftSession.local("graft-demo")
    val res = Pipeline.runFromBronze(spark, bronze, Pipeline.Layout(warehouse),
      processingDate, batchId = System.currentTimeMillis() / 1000)
    println(s"gold tables: ${res.tables.mkString(", ")}")
    GoldCatalog.sql(spark,
      "SELECT asteroid_id, velocity_km_s, miss_distance_km FROM fact_asteroid_approach LIMIT 5"
    ).show(truncate = false)
    spark.stop()
  }
}
