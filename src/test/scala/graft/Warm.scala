package graft
object Warm {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_sim_topk", "q_dedup_embed", "q_window_rank", "q_dedup_minhash")
    for (i <- 1 to 3) {
      for (q <- qs) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, d).count()
        println(f"run$i $q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
