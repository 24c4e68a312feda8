package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch probe: per-stage timing of the minhash pair pipeline. */
object LshStageProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/repo/target/testdata/sf1"
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Tables.documents(spark, d)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val sigs = docs.select(col("doc_id"), graft.functions.Vec.minhash(col("text")).as("sigs"))
    t("sigs only")(sigs.count())
    val exploded = sigs.select(col("doc_id"), col("sigs"),
      explode(transform(sequence(lit(0), lit(7)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sigs"), b * 4 + 1, lit(4))).as("bsig")))).as("bk"))
      .select(col("doc_id"), col("sigs"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
    t("exploded")(exploded.count())
    val wb = Window.partitionBy("band", "bsig")
    val counted = exploded.withColumn("__bn", count(lit(1)).over(wb))
      .filter(col("__bn") <= 256).drop("__bn")
    t("window-counted")(counted.count())
    val grouped = counted.groupBy("band", "bsig")
      .agg(collect_list(struct(col("doc_id"), col("sigs"))).as("items"))
      .filter(size(col("items")) > 1)
    t("grouped")(grouped.count())
    val pairs = grouped
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
    t("pairs exploded")(pairs.count())
    val est = pairs.select(
      col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
      (aggregate(zip_with(col("a.sigs"), col("b.sigs"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
        .cast("double") / 32).as("est_jaccard"))
    t("est_jaccard")(est.count())
    t("dedup+filter+sort")(est.dropDuplicates("id1", "id2")
      .filter(col("est_jaccard") >= 0.5).orderBy("id1", "id2").count())
    spark.stop()
  }
}
