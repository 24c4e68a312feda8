package graft

/** IVF ANN recall ladder: recall@5 of `Llm.q_sim_ivf` against the exact
  * `Llm.q_sim_topk` baseline — same 20 pinned queries, same k, same
  * tie-break — across corpora and the nProbe knob, one JSON artifact.
  *
  * Round 12: the ladder runs on the CLUSTERED fixtures
  * ([[GenIvfFixture]] planted Gaussian mixture — real-embedding
  * geometry) with the at-scale quantizer sizing nList = ⌈√n⌉, alongside
  * the legacy uniform sf dirs at the gate default nList=16 for
  * continuity. On uniform embeddings recall is ∝ probed-fraction by
  * construction (the round-11 "no knee" artifact); the clustered curve
  * is the one operating points are defended against.
  *
  * `sbt "Test/runMain graft.IvfRecall <out.json> <sfDir>[:nList] ..."`
  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "IVF_RECALL_r12.json"
    val specs: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq(
        "/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "target/testdata/ivf_clustered_5k:sqrt",
        "target/testdata/ivf_clustered_50k:sqrt",
        "target/testdata/ivf_clustered_500k:sqrt")
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val rows = for (spec <- specs) yield {
      // split on the LAST ':' only — a dir containing ':' must not
      // shatter into a MatchError; empty spec fails loudly instead
      val (d, nListSpec) = spec.lastIndexOf(':') match {
        case -1 if spec.nonEmpty => (spec, "16")
        case i if i > 0 => (spec.substring(0, i), spec.substring(i + 1))
        case _ => sys.error(s"IvfRecall: unusable spec '$spec' (want dir[:nlist])")
      }
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      val nList =
        if (nListSpec == "sqrt") math.ceil(math.sqrt(n.toDouble)).toInt
        else nListSpec.toInt
      // probe ladder: powers of two up to half the cells, stopping two
      // rungs after recall saturates at 1.0 (every further rung costs a
      // full quantizer retrain and can only re-measure 1.0)
      val nProbes = Iterator.iterate(1)(_ * 2).takeWhile(_ <= nList / 2).toSeq
      val exact = pairs(graft.ops.Llm.q_sim_topk(spark, d))
      var saturated = 0
      val perProbe = for (np <- nProbes if saturated < 2) yield {
        val got = pairs(graft.ops.Llm.q_sim_ivf(spark, d, 100.0, np, nList))
        val rec = got.intersect(exact).size.toDouble / math.max(1, exact.size)
        if (rec >= 1.0) saturated += 1 else saturated = 0
        println(f"[ivfrecall] $d n=$n nList=$nList nProbe=$np recall@5=$rec%.4f " +
          f"(${got.size} emitted / ${exact.size} exact)")
        f""" {"n_probe": $np, "recall_at_5": $rec%.4f, "emitted": ${got.size}, "exact_pairs": ${exact.size}}"""
      }
      s""" {"sf_dir": "$d", "n": $n, "n_list": $nList,
 "by_n_probe": [
${perProbe.mkString(",\n")}
 ]}"""
    }
    val json =
      s"""{
 "what": "q_sim_ivf recall@5 vs the exact q_sim_topk baseline (same 20 pinned queries, k=5, cid tie-break) across corpora and nProbe",
 "config": {"train_fraction": 100.0, "k": 5, "queries": 20, "n_list": "16 on the legacy uniform sf dirs (gate default), ceil(sqrt(n)) on the clustered fixtures (the at-scale sizing)"},
 "note": "clustered fixtures are a planted 64-component Gaussian mixture (GenIvfFixture) — real-embedding geometry; the uniform sf dirs keep the round-11 continuity curve, whose recall is proportional to probed fraction BY CONSTRUCTION (every cell equidistant). Operating points are defended against the clustered curve. Precision is not a free variable (every emitted candidate's cosine is exact).",
 "results": [
${rows.mkString(",\n")}
 ]}
"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[ivfrecall] wrote $out")
    spark.stop()
  }
}
