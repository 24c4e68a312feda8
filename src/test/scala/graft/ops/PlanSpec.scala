package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the plans the optimizer picks are part of
  * the contract (SURVEY.md §4) — a regression that silently drops a
  * pushdown or broadcasts-turned-cartesian would still pass value checks
  * at test scale but melt at 100 TB.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString()
  def optimizedOf(df: DataFrame): String = df.queryExecution.optimizedPlan.toString()

  test("projection is pruned into the parquet scan (ReadSchema)") {
    val plan = planOf(Relational.q_project_cast(spark, sf))
    // the part table has 6 columns; the scan must read only the 4 used
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("p_brand"), "unused column p_brand must not be scanned")
  }

  test("filter predicates are pushed to the parquet scan (PushedFilters)") {
    val plan = planOf(Relational.q_filter_pred(spark, sf))
    // (plan strings truncate filter lists — match the stable prefix)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"), s"expected pushdown in:\n$plan")
  }

  test("global top-N plans TakeOrderedAndProject, not a full sort") {
    val plan = planOf(Relational.q_sort_limit(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("sim_topk broadcasts the query side; no cartesian product") {
    val plan = planOf(Llm.q_sim_topk(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"), "cross join must be broadcast, not cartesian")
  }

  test("minhash LSH candidate join is an equi-join, never cartesian") {
    val plan = planOf(Llm.q_dedup_minhash(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("range join stays keyed on the equi-part (no BNLJ)") {
    val plan = planOf(Relational.q_join_range(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "band predicate must ride the p_partkey equi-join as a post-filter")
  }

  test("star join broadcasts the dimension tables") {
    val plan = planOf(Relational.q_join_dims(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"nation/region must broadcast in:\n$plan")
  }

  test("aggregations are partial+final (map-side combine)") {
    val plan = planOf(Relational.q_agg_group(spark, sf))
    assert(plan.contains("partial_"), "expected partial aggregation before the shuffle")
  }

  test("asof join is a single window pass — exactly one shuffle of events") {
    val df = Relational.q_join_asof(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Join"), "as-of must not be a join at all (window formulation)")
  }

  test("whole-stage codegen covers the scan→filter→project spine") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // under AQE the codegen-staged plan only exists once executed
    val df = Relational.q_filter_pred(spark, sf)
    df.collect() // executes df's OWN queryExecution (count() would build a new one)
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // codegen stages print as "*(n) Op"; the scan→filter→project spine
    // (stage 1) must be inside one
    assert(finalPlan.toString.contains("*(1) Filter"),
      s"scan spine not codegen'd in:\n$finalPlan")
  }
}
