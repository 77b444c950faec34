package graft

/** Prints SparkEntry.queries map iteration order — the bench pass-1 visit
  * order (diagnostic for position-pinned suite-context effects). */
object OrderProbe {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.zipWithIndex.foreach { case (k, i) =>
      println(f"ORD $i%3d $k")
    }
}
