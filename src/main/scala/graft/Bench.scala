package graft

/** Driver benchmark surface: one JSON line of per-query wall seconds.
  * An untimed warmup pass at sf0.001 first exercises every query's
  * codegen/parquet path, so the timed pass measures the engine rather
  * than single-shot JVM/JIT/codegen initialization (first-query cold
  * penalty measured at 4-5s, warm 0.2s).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm on the smallest sibling sf if present, else the target data
    // itself — a missing warm dir must never silently skip the warmup
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR")
      .orElse(Some("/root/testdata/sf0.001").filter(p => new java.io.File(p).isDirectory))
      .getOrElse(sfDir)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[bench-warm] $name: ${e.getMessage}") }
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Millisecond precision keeps the whole line compact (~2.5KB for 100+
    // queries vs ~5.5KB at full double repr): the round-1 driver captured
    // only a bounded tail of stdout and the JSON start fell outside it
    // (BENCH_r01.json "parsed": null, tail begins mid-JSON). Locale.ROOT
    // so the decimal separator is always '.'.
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
