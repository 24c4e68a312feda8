package graft.ops
object CardParts {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.GraftSession.local(12)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "target/testdata/sf100"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"[parts] $label: ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    val norm = lower(trim(regexp_replace(
      regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""), " +", " ")))
    def g = Tables.documents(spark, d)
      .select(col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(norm).as("k"))
    time("scan+project+md5 (floor)") {
      g.agg(sum(length(col("k"))), sum(col("n_tokens"))).collect()
    }
    time("counts-only grouping sets (hash agg)") {
      g.groupingSets(
        Seq(Seq(col("source")), Seq(col("source"), col("lang")), Seq(col("source"), col("k"))),
        col("source"), col("lang"), col("k"))
       .agg(count(lit(1)).as("c"), sum(col("n_tokens")).as("tok"), grouping_id().as("gid"))
       .filter(col("gid") === 2).groupBy("source").agg(sum("c")).collect()
    }
    time("per-source percentile alone (ObjectHashAgg, 20 groups)") {
      g.groupBy("source").agg(
        percentile(col("n_chars"), lit(0.5)), percentile(col("n_chars"), lit(0.95))).collect()
    }
    spark.stop()
  }
}
