package graft

/** Scratch probe: dump the formatted physical plan of registered
  * queries. `sbt "Test/runMain graft.ExplainProbe <sfDir> <q1> [q2...]"`.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.drop(1)) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
