package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Execution-config invariance: the suite's determinism conventions
  * (exact-decimal accumulation, total orders, hash-threshold sampling)
  * claim results do not depend on HOW the plan executes. Prove it by
  * re-running representative queries under different runtime configs
  * and requiring bit-identical rows — the property that keeps the
  * DuckDB gate meaningful under AQE re-planning, partition coalescing,
  * and speculative re-execution at cluster scale.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  // float-heavy agg, global window, salted join, hash sample, iterative —
  // plus the round-4 ops whose determinism claims are load-bearing:
  // DECIMAL-summed DSIR scores, broadcast-cutpoint bins, md5-ranked
  // quota draws, decimal-weighted TWAP, merged incremental state
  private val probes = Seq(
    "q_tpch_q1ish", "q_window_rank", "q_join_salted", "q_sample_hash",
    "q_quality_classifier", "q_agg_stats2",
    "q_dsir_weights", "q_feature_bins", "q_temperature_sample",
    "q_twap", "q_incr_rollup")

  private def run(name: String): Seq[String] =
    graft.SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("results are bit-identical with AQE disabled") {
    val base = probes.map(n => n -> run(n)).toMap
    withConf("spark.sql.adaptive.enabled" -> "false") {
      probes.foreach { n =>
        assert(run(n) == base(n), s"$n drifts without AQE")
      }
    }
  }

  test("results are bit-identical under a different shuffle fan-out") {
    val base = probes.map(n => n -> run(n)).toMap
    withConf("spark.sql.shuffle.partitions" -> "13") {
      probes.foreach { n =>
        assert(run(n) == base(n), s"$n depends on the partition count")
      }
    }
  }
}
