package graft

import org.apache.spark.sql.functions._

/** Scratch probe: find the rows where graft_charstats diverges from the
  * explode reference. */
object CharParityProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq(
      "the quick brown fox", "aaaa", "a", "ab\tcd\nef",
      "café touché", "éclair",
      new java.lang.StringBuilder().appendCodePoint(0x1F600).append('a')
        .appendCodePoint(0x10348).toString,
      "中文 text", "base64==//++")
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(edges.zipWithIndex
        .map { case (t, i) => (1000000L + i, t) }.toDF("doc_id", "text"))
    val kernel = docs
      .select(col("doc_id"), graft.functions.Vec.charStats(col("text")).as("cs"))
      .filter(col("cs").isNotNull)
      .select(col("doc_id"), col("cs.n_chars_split").as("k_n"),
        col("cs.entropy_micro").as("k_e"))
    val ref = graft.ops.Llm.charEntropyExplodeRef(docs)
      .withColumnRenamed("n_chars_split", "r_n")
      .withColumnRenamed("entropy_micro", "r_e")
    kernel.join(ref, Seq("doc_id"), "full")
      .filter(col("k_n") =!= col("r_n") || col("k_e") =!= col("r_e")
        || col("k_n").isNull || col("r_n").isNull)
      .join(docs, Seq("doc_id"), "left")
      .orderBy("doc_id").show(20, false)
    spark.stop()
  }
}
