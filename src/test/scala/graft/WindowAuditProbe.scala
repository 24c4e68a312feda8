package graft

/** Scratch probe: count Window nodes in every registered query's
  * optimized plan — flags CollapseWindow-blocked chains of the kind
  * that cost q_attribution_linear 3.2× at sf100 (r13). Multiple
  * Window nodes are legitimate when the SPECS differ (different
  * partition keys / orders); the flag is a prompt to read the plan,
  * not a verdict. `sbt "Test/runMain graft.WindowAuditProbe [min]"`.
  */
object WindowAuditProbe {
  def main(args: Array[String]): Unit = {
    val min = if (args.nonEmpty) args(0).toInt else 3
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      try {
        val plan = SparkEntry.queries(name)(spark, d)
          .queryExecution.optimizedPlan.toString()
        val n = "Window \\[".r.findAllIn(plan).size
        val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(plan).toSet.size
        if (n >= min) println(f"[winaudit] $name%-28s windows=$n distinct_specs=$specs")
      } catch { case e: Throwable =>
        println(s"[winaudit] $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
