package graft

/** Scratch probe: per-STAGE task-time attribution with stage NAMES
  * (callsites), the missing link between Bench's [taskstats] stage ids
  * and operators. Runs one registered query (1 warm run on the warm dir
  * + 1 measured run on the target), then prints every stage of the
  * measured run: id, task count, task-time sum, and the stage's
  * callsite name. Cpus/partitions ride the usual env knobs
  * (SPARK_GRAFT_CPUS / SPARK_GRAFT_PARTITIONS).
  *
  * `sbt "Test/runMain graft.StageProbe <name> <sfDir> [warmDir]"` or the
  * flat-classpath java invocation with test-classes on the cp.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", "0").toInt
    val spark = GraftSession.local(cpus, parts)
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new scala.collection.mutable.LinkedHashMap[Int, (String, Int, Long)]
    val tasks = new scala.collection.mutable.HashMap[Int, (Int, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful) tasks.synchronized {
          val (n, s) = tasks.getOrElse(t.stageId, (0, 0L))
          tasks(t.stageId) = (n + 1, s + t.taskInfo.duration)
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages(sc.stageInfo.stageId) =
            (sc.stageInfo.name, sc.stageInfo.numTasks, 0L)
        }
    })
    val warm = if (args.length > 2) args(2) else d
    SparkEntry.queries(name)(spark, warm).count()
    tasks.synchronized(tasks.clear()); stages.synchronized(stages.clear())
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, d).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // listener bus drain
    println(f"[stageprobe] $name wall=$wall%.2f s rows=$n cpus=$cpus parts=$parts")
    val rows = stages.synchronized(stages.toSeq).map { case (id, (nm, nt, _)) =>
      val (done, sum) = tasks.synchronized(tasks.getOrElse(id, (0, 0L)))
      (id, nm, nt, done, sum)
    }.sortBy(-_._5)
    rows.foreach { case (id, nm, nt, done, sum) =>
      println(f"[stageprobe] stage=$id%-4d tasks=$done%-4d sum=$sum%-8d ms  $nm")
    }
    spark.stop()
  }
}
