package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join node must (1) agree row-for-row with the
  * union+window formulation (`Scale.asofJoin`) — including on a
  * SELF-SOURCE as-of (both inputs derive from the same scan, the
  * exprId-collision trap), (2) handle ties and misses, and (3) plan as
  * a co-partitioned merge: AsofJoinExec with one shuffle per side and
  * no UNION in the plan.
  */
class AsofJoinPlanSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def eventsBase = {
    graft.ops.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_ns")
  }

  test("native as-of ≡ union+window as-of on a self-source input") {
    val left = eventsBase
    val right = eventsBase.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), col("event_id").as("purchase_id"))
    val native = Asof.join(left, right, "user_id", "ts_ns", "ts_ns", Seq("purchase_id"))
      .select("event_id", "asof_purchase_id")
    val window = graft.ops.Scale.asofJoin(left, right, "user_id", "ts_ns", "ts_ns", Seq("purchase_id"))
      .select("event_id", "asof_purchase_id")
    assert(native.count() == left.count())
    assert(native.except(window).isEmpty && window.except(native).isEmpty,
      "native and window as-of formulations disagree")
  }

  test("semantics: inclusive ties, greatest payload on (key,ts) ties, null on miss") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (3L, 1L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 5L, 100L), (1L, 5L, 200L), // tie on (k, ts): greatest payload (200) wins
      (1L, 9L, 300L),
      (2L, 8L, 400L))                 // after left ts=7: no match
      .toDF("k", "ts", "v")
    val got = Asof.join(left, right, "k", "ts", "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(got == Map("a" -> Some(300L), "b" -> Some(200L), "c" -> None, "d" -> None))
  }

  test("null keys/timestamps never match — native and window formulations agree") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(10L), "a"),
      (None: Option[Long], Option(10L), "nullkey"),  // null key: must NOT inherit a null-key right payload
      (Option(1L), None: Option[Long], "nullts"))    // null ts: no right row precedes it
      .toDF("k", "ts", "tag")
    val right = Seq(
      (Option(1L), Option(5L), 100L),
      (None: Option[Long], Option(5L), 666L),        // null-key right payload must never surface
      (Option(1L), None: Option[Long], 777L))        // null-ts right row must never surface
      .toDF("k", "ts", "v")
    val expect = Map("a" -> Some(100L), "nullkey" -> None, "nullts" -> None)
    val native = Asof.join(left, right, "k", "ts", "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    val window = graft.ops.Scale.asofJoin(left, right, "k", "ts", "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(native == expect, s"native: $native")
    assert(window == expect, s"window: $window")
  }

  test("mismatched key/ts types fail at plan time, not inside the merge") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "tag")
    val right = Seq((1, 5L, 100L)).toDF("k", "ts", "v") // int key vs long key
    val e = intercept[IllegalArgumentException] {
      Asof.join(left, right, "k", "ts", "ts", Seq("v"))
    }
    assert(e.getMessage.contains("key type mismatch"))
  }

  test("forward native as-of ≡ the window formulation; ties take the smallest payload; miss = null") {
    import spark.implicits._
    // window reference over the gate data
    val win = graft.ops.Relational.q_join_asof_forward(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val native = graft.ops.Relational.q_join_asof_fwd_native(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(native == win)
    // hand case: equal (key, ts) right rows → SMALLEST payload; events
    // after the last right row → null
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 31L, "c")).toDF("k", "ts", "tag")
    val right = Seq((1L, 20L, 7L), (1L, 20L, 3L), (1L, 30L, 9L)).toDF("k", "ts", "v")
    val got = Asof.join(left, right, "k", "ts", "ts", Seq("v"), forward = true)
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map("a" -> Some(3L), "b" -> Some(3L), "c" -> None), s"got $got")
  }

  test("plan: AsofJoinExec merge, exactly one shuffle per side, no Union/Window") {
    val left = eventsBase
    val right = eventsBase.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), col("event_id").as("purchase_id"))
    val df = Asof.join(left, right, "user_id", "ts_ns", "ts_ns", Seq("purchase_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(s.contains("AsofJoin"), s"native node missing in:\n$s")
    assert(!s.contains("Union") && !s.contains("RunningWindowFunction") && !s.contains("Window"),
      s"union/window rewrite leaked into:\n$s")
    val shuffles = "Exchange".r.findAllIn(s).size
    assert(shuffles == 2, s"expected exactly 2 shuffles (one per side), got $shuffles in:\n$s")
    // whole-stage codegen must COVER the merge (a '*(n) AsofJoin' span),
    // not silently fall back to the interpreted iterator — and codegen
    // compilation must succeed (a Janino failure also falls back, but
    // leaves the star prefix; the round-trip collect() above plus the
    // parity suites prove the generated loop, not just its presence)
    assert("""\*\(\d+\) AsofJoin""".r.findFirstIn(s).isDefined,
      s"AsofJoin must be inside a WholeStageCodegen span:\n$s")
  }

  test("codegen merge loop ≡ interpreted merge (codegen off) on both directions") {
    val left = eventsBase
    val right = eventsBase.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ns"), col("event_id").as("view_id"),
        col("event_type").as("vtype"))
    for (fwd <- Seq(false, true)) {
      val on = Asof.join(left, right, "user_id", "ts_ns", "ts_ns",
        Seq("view_id", "vtype"), forward = fwd).collect().map(_.toString).sorted
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        val off = Asof.join(left, right, "user_id", "ts_ns", "ts_ns",
          Seq("view_id", "vtype"), forward = fwd).collect().map(_.toString).sorted
        assert(on.toSeq == off.toSeq,
          s"codegen and interpreted merges disagree (forward=$fwd)")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }
}
