package graft

/** IVF ANN recall ladder (round-10 verdict item 7): recall@5 of
  * `Llm.q_sim_ivf` against the exact `Llm.q_sim_topk` baseline — same
  * 20 pinned queries, same k, same tie-break — across SF decades and
  * the nProbe knob, written as one JSON artifact.
  *
  * `sbt "Test/runMain graft.IvfRecall <out.json> <sfDir1> [sfDir2 ...]"`
  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "IVF_RECALL_r11.json"
    val sfDirs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "target/testdata/sf1")
    val nProbes = Seq(1, 2, 4, 8)
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val rows = for (d <- sfDirs) yield {
      val exact = pairs(graft.ops.Llm.q_sim_topk(spark, d))
      val perProbe = for (np <- nProbes) yield {
        val got = pairs(graft.ops.Llm.q_sim_ivf(spark, d, 100.0, np))
        val rec = got.intersect(exact).size.toDouble / math.max(1, exact.size)
        println(f"[ivfrecall] $d nProbe=$np recall@5=$rec%.4f (${got.size} emitted / ${exact.size} exact)")
        f""" {"n_probe": $np, "recall_at_5": $rec%.4f, "emitted": ${got.size}, "exact_pairs": ${exact.size}}"""
      }
      s""" {"sf_dir": "$d",
 "by_n_probe": [
${perProbe.mkString(",\n")}
 ]}"""
    }
    val json =
      s"""{
 "what": "q_sim_ivf recall@5 vs the exact q_sim_topk baseline (same 20 pinned queries, k=5, cid tie-break) across SF decades and nProbe",
 "config": {"n_list": 16, "train_fraction": 100.0, "k": 5, "queries": 20},
 "note": "precision is not a free variable (every emitted candidate's cosine is exact); the ladder isolates the coarse-quantizer recall loss. DEFAULT operating point nProbe=8/16 since round 11 (the curve has no knee below half the corpus on uniform embeddings; 8 is the highest recall before probing degenerates); see q_sim_ivf scaladoc.",
 "results": [
${rows.mkString(",\n")}
 ]}
"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[ivfrecall] wrote $out")
    spark.stop()
  }
}
