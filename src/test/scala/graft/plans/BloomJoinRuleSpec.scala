package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-injected bloom-prefilter join: the rule must fire on a
  * plain shuffle equi-join with a selective dim filter (no caller
  * opt-in), must NOT fire under a broadcast join (where the prefilter
  * is pure overhead), must stay idempotent, and must not change
  * results.
  */
class BloomJoinRuleSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def optimizedOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("q_join_bloom: rule injects might_contain prefilter without caller opt-in") {
    val df = graft.ops.Relational.q_join_bloom(spark, sf)
    val plan = optimizedOf(df)
    assert(plan.toLowerCase.contains("might_contain"),
      s"bloom prefilter missing from optimized plan:\n$plan")
    assert(plan.contains("scalar-subquery") || plan.toLowerCase.contains("subquery"),
      s"bloom build subquery missing:\n$plan")
  }

  test("rewrite is result-identical to the plain join") {
    val lineitem = graft.ops.Tables.lineitem(spark, sf)
    val dim = graft.ops.Tables.part(spark, sf)
      .filter(col("p_size") <= 10).select(col("p_partkey"), col("p_brand"))
    val bloomed = lineitem.join(dim.hint("shuffle_merge"), col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    val plain = lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    assert(optimizedOf(bloomed).toLowerCase.contains("might_contain"))
    assert(bloomed.count() == plain.count())
    assert(bloomed.except(plain).isEmpty && plain.except(bloomed).isEmpty)
  }

  test("rule does NOT fire when the dim broadcasts (prefilter would be pure overhead)") {
    val lineitem = graft.ops.Tables.lineitem(spark, sf)
    val dim = graft.ops.Tables.part(spark, sf)
      .filter(col("p_size") <= 10).select(col("p_partkey"), col("p_brand"))
    // tiny dim, no shuffle hint → broadcast join → no injection
    val df = lineitem.join(dim, col("l_partkey") === col("p_partkey"))
    assert(!optimizedOf(df).toLowerCase.contains("might_contain"))
  }

  test("idempotent: exactly one bloom probe per application side and key") {
    val df = graft.ops.Relational.q_join_bloom(spark, sf)
    val plan = optimizedOf(df)
    val n = "might_contain".r.findAllIn(plan.toLowerCase).size
    assert(n == 1, s"expected exactly 1 bloom probe, got $n:\n$plan")
    df.collect() // and the plan executes cleanly end to end
  }

  test("no injection on outer joins (unmatched fact rows must survive)") {
    val lineitem = graft.ops.Tables.lineitem(spark, sf)
    val dim = graft.ops.Tables.part(spark, sf)
      .filter(col("p_size") <= 10).select(col("p_partkey"), col("p_brand"))
    val df = lineitem.join(dim.hint("shuffle_merge"),
      col("l_partkey") === col("p_partkey"), "left")
    assert(!optimizedOf(df).toLowerCase.contains("might_contain"))
  }
}
