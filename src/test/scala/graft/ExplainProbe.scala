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

/** Executed-plan probe: run the query, then dump the FINAL adaptive
  * plan (shows ReusedExchange/ReusedQueryStage nodes AQE installed).
  * `sbt "Test/runMain graft.ExecProbe <sfDir> <q1> [q2...]"`.
  */
object ExecProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.drop(1)) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, args(0))
      // execute THIS df's plan (count() would plan a separate agg tree
      // and leave df's own adaptive plan unfinalized)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
