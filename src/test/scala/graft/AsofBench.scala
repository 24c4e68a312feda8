package graft

import org.apache.spark.sql.functions._

/** Isolated as-of join micro-bench: native AsofJoinExec merge vs the
  * union+window rewrite, stripped of the shared scan-side work (events
  * normalization, presentation orderBy) that dilutes whole-query
  * numbers. Run: `sbt "Test/runMain graft.AsofBench [sfDir]"`.
  */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = sys.env.getOrElse("ASOF_BENCH_REPS", "32").toInt
    // replicate the events table `reps`× with disjoint user spaces: the
    // same key distribution at reps× the volume, so per-row merge cost
    // dominates fixed plan overhead
    def rep(df: org.apache.spark.sql.DataFrame) = df
      .crossJoin(spark.range(reps).select(col("id").as("__rep")))
      .withColumn("user_id", col("user_id") + col("__rep") * 10000000L)
      .drop("__rep")
    val base = rep(ops.Tables.events(spark, d)
        .select(col("event_id"), col("user_id"), col("ts_ns")))
      .localCheckpoint() // both variants read the same materialized input
    val purchases = rep(ops.Tables.events(spark, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ns"), col("event_id").as("purchase_id")))
      .localCheckpoint()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 5) {
        val t0 = System.nanoTime()
        // aggregate OVER THE PAYLOAD: a bare count() would let the
        // optimizer prune the window/merge computation entirely
        val n = df.agg(sum(hash(col("asof_purchase_id")))).collect()(0).getLong(0)
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (checksum $n)")
      }
    }
    time("native ")(plans.Asof.join(base, purchases, "user_id", "ts_ns", "ts_ns", Seq("purchase_id")))
    time("window ")(ops.Scale.asofJoin(base, purchases, "user_id", "ts_ns", "ts_ns", Seq("purchase_id")))
    time("nativeF")(plans.Asof.join(base, purchases, "user_id", "ts_ns", "ts_ns", Seq("purchase_id"), forward = true))
    spark.stop()
  }
}
