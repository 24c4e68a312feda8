package graft
object Warm {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      for (q <- Seq("q_sim_topk", "q_dedup_embed", "q_window_rank", "q_dedup_minhash")) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, d).count()
        println(f"run$i $q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
