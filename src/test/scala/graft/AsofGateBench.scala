package graft

/** Gate-level micro-bench for the native as-of operator vs the
  * union+window formulation (companion to AsofBench's isolated merge
  * bench): runs the four registered gate queries in ONE warm JVM and
  * prints medians + the codegen coverage of the native plan. Usage:
  * `sbt "Test/runMain graft.AsofGateBench [sfDir]"`.
  */
object AsofGateBench {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")

    val native = graft.ops.Relational.q_join_asof_native(spark, d)
    native.collect()
    val plan = native.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(plan.toString.linesIterator
      .filter(l => l.contains("AsofJoin") || l.contains("WholeStageCodegen"))
      .mkString("\n"))

    def time(f: => Long): Double = {
      (1 to 3).foreach(_ => f)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(2)
    }
    val tn = time(graft.ops.Relational.q_join_asof_native(spark, d).count())
    val tw = time(graft.ops.Relational.q_join_asof(spark, d).count())
    val tfn = time(graft.ops.Relational.q_join_asof_fwd_native(spark, d).count())
    val tfw = time(graft.ops.Relational.q_join_asof_forward(spark, d).count())
    println(f"backward: native $tn%.3f window $tw%.3f ratio ${tn / tw}%.2f")
    println(f"forward:  native $tfn%.3f window $tfw%.3f ratio ${tfn / tfw}%.2f")
    // what the generated merge buys over the interpreted iterator
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val tni = time(graft.ops.Relational.q_join_asof_native(spark, d).count())
    val tfni = time(graft.ops.Relational.q_join_asof_fwd_native(spark, d).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    println(f"interpreted: backward $tni%.3f (codegen ${tn / tni}%.2fx) " +
      f"forward $tfni%.3f (codegen ${tfn / tfni}%.2fx)")
    spark.stop()
  }
}
