package graft

/** Scratch probe: time one registered query in a clean JVM.
  * `sbt "Test/runMain graft.QProbe <name> <sfDir> [warmDir]"`.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args(1)
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 2) { // optional small-sf warmup, like Bench
      SparkEntry.queries(name)(spark, args(2)).count()
      println(s"[qprobe] warmed on ${args(2)}")
    }
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"[qprobe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
