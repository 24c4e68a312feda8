package graft

import org.apache.spark.sql.functions._

/** Scratch probe: dump the executed plan of the terasort helpers'
  * MICRO subtree (normally hidden behind the localCheckpoint) to see
  * whether the pid-keyed window inserts a second full exchange.
  * `sbt "Test/runMain graft.CumProbe <sfDir>"`.
  */
object CumProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = ops.Tables.orders(spark, args(0))
      .select(col("o_orderkey"), col("o_totalprice"))
    // the globalCumSum shape, pre-checkpoint: range sort + pid window
    val parts = 4
    val sorted = df.repartitionByRange(parts, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .withColumn("__pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = sorted.withColumn("cum",
      sum(col("o_totalprice").cast("decimal(18,2)")).over(w))
    cum.collect()
    println(cum.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
