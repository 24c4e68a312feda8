package graft

import org.apache.spark.sql.functions._

/** Scratch probe: LSH bucket-size distribution and candidate-pair
  * volume of the minhash dedup at a given SF dir (not a spec).
  * `sbt "Test/runMain graft.LshProbe <sfDir>"`.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Tables.documents(spark, d)
    val buckets = graft.ops.Llm.minhashBucketSizes(docs)
    buckets.cache()
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("pairs_all"),
      sum(when(col("n") <= 256, col("n") * (col("n") - 1) / 2)
        .otherwise(0)).as("pairs_capped")).head()
    println(s"[lshprobe] $d -> $stats")
    println("[lshprobe] top bucket sizes:")
    buckets.orderBy(col("n").desc).limit(20).collect()
      .foreach(r => println(s"  n=${r.get(r.fieldIndex("n"))}"))
    spark.stop()
  }
}
