package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-injected binned range join: with a binSize configured, a
  * keyless band join must plan as an equi-join on the bin id (no BNLJ
  * / cartesian), stay result-identical to the naive join — boundary
  * and strictness cases included — and must NOT fire where the rewrite
  * could change semantics (equi conjunct present, semi join with the
  * interval side on the left) or when unconfigured.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def nested(df: DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
  }

  /** Run `body` with the rule enabled at the given bin size; the shared
    * session must come back with the rule off.
    */
  private def withBin[A](bin: Long)(body: => A): A =
    try { spark.conf.set("spark.graft.rangeJoin.binSize", bin.toString); body }
    finally spark.conf.unset("spark.graft.rangeJoin.binSize")

  import spark.implicits._
  private def points = Seq(0L, 1L, 99L, 100L, 101L, 199L, 200L, 250L, 999L)
    .toDF("pt").withColumn("pid", col("pt"))
  private def intervals = Seq(
    (1L, 50L, 200L), (2L, 0L, 301L), (3L, 120L, 130L),
    (4L, 500L, 500L), (5L, 400L, 300L))
    .toDF("iid", "start", "end")

  test("keyless band join: BNLJ without the rule, equi-join with it, identical rows") {
    val join = points.join(intervals,
      col("pt") >= col("start") && col("pt") < col("end"))
    assert(nested(join), "precondition: unconfigured rule leaves the BNLJ")
    val naive = join.select("pid", "iid").as[(Long, Long)].collect().toSet
    withBin(100L) {
      val binned = points.join(intervals,
        col("pt") >= col("start") && col("pt") < col("end"))
      assert(!nested(binned), s"rule must delete the BNLJ:\n${planOf(binned)}")
      val got = binned.select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"binned=$got naive=$naive")
      assert(binned.count() == naive.size, "each pair exactly once")
    }
  }

  test("strict/inclusive bound variants stay result-identical") {
    for ((lo, hi) <- Seq(
        (col("pt") > col("start"), col("pt") <= col("end")),
        (col("pt") >= col("start"), col("pt") <= col("end")),
        (col("pt") > col("start"), col("pt") < col("end")))) {
      val naive = points.join(intervals, lo && hi)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      withBin(100L) {
        val binned = points.join(intervals, lo && hi)
        assert(!nested(binned))
        assert(binned.select("pid", "iid").as[(Long, Long)].collect().toSet == naive)
      }
    }
  }

  test("mirrored operand order (start <= pt AND end > pt) is recognized") {
    val naive = points.join(intervals,
      col("start") <= col("pt") && col("end") > col("pt"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withBin(100L) {
      val binned = points.join(intervals,
        col("start") <= col("pt") && col("end") > col("pt"))
      assert(!nested(binned))
      assert(binned.select("pid", "iid").as[(Long, Long)].collect().toSet == naive)
    }
  }

  test("left-semi with the interval side on the right fires; on the left it must not") {
    withBin(100L) {
      val semi = points.join(intervals,
        col("pt") >= col("start") && col("pt") < col("end"), "left_semi")
      assert(!nested(semi), "semi with exploded right side is safe → must fire")
      val kept = semi.select("pid").as[Long].collect().toSet
      val want = Set(0L, 1L, 99L, 100L, 101L, 199L, 200L, 250L) // all in iid=2 except 999
      assert(kept == want, s"kept=$kept")
      // interval side on the LEFT of a semi join: exploding the left
      // would multiply its rows — the rule must leave the join alone
      val semiIntervalLeft = intervals.join(points,
        col("pt") >= col("start") && col("pt") < col("end"), "left_semi")
      assert(nested(semiIntervalLeft), "rule must not explode a semi join's left side")
      assert(semiIntervalLeft.select("iid").as[Long].collect().toSet == Set(1L, 2L))
    }
  }

  test("epoch-ns magnitudes (> 2^53): rule bins exactly, result identical to naive") {
    // double ulp at ~2^61 is 512 ns — a double-division floor misplaces
    // boundary values; the integral floor-div path must not
    val B = 1000000000L
    val base = 2300000000000000000L
    val pts = Seq(base - 300, base - 100, base - 1, base, base + 1,
        base + 100, base + B - 550, base + B - 1, base + B, base + B + 1)
      .toDF("pt").withColumn("pid", col("pt") - base)
    val ivs = Seq(
      (1L, base - 120, base - 20), (2L, base - 300, base + 5),
      (3L, base, base + B), (4L, base + B - 600, base + B - 100))
      .toDF("iid", "start", "end")
    val naive = pts.join(ivs, col("pt") >= col("start") && col("pt") < col("end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withBin(B) {
      val binned = pts.join(ivs, col("pt") >= col("start") && col("pt") < col("end"))
      assert(!nested(binned), s"rule must fire:\n${planOf(binned)}")
      val got = binned.select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(naive.nonEmpty && got == naive, s"binned=$got naive=$naive")
    }
  }

  test("malformed binSize disables the rule instead of failing every query") {
    try {
      spark.conf.set("spark.graft.rangeJoin.binSize", "7d")
      val join = points.join(intervals,
        col("pt") >= col("start") && col("pt") < col("end"))
      // the optimizer must neither throw nor rewrite
      assert(nested(join), "unparseable conf = rule off")
      assert(join.count() == 12L)
    } finally spark.conf.unset("spark.graft.rangeJoin.binSize")
  }

  test("rule-rewritten plain join ≡ the DuckDB-oracled explicit helper query") {
    // q_join_range_binned (Scale.binnedRangeJoin, hash-exact vs DuckDB)
    // re-expressed as the NAIVE join the rule rewrites: same rows ⇒ the
    // optimizer path inherits the oracle's verdict
    val sf = "/root/testdata/sf0.001"
    import graft.ops.{Relational, Tables}
    val DayMs = 86400000L
    def ms(c: org.apache.spark.sql.Column) = unix_millis(c.cast("timestamp"))
    val oracled = Relational.q_join_range_binned(spark, sf).collect().map(_.toSeq).toSeq
    withBin(7 * DayMs) {
      val auto = Tables.lineitem(spark, sf)
        .select(col("l_extendedprice"), ms(col("l_shipdate")).as("pt"))
        .join(Tables.orders(spark, sf)
            .filter(col("o_orderkey") % 1000 === 0)
            .select(col("o_orderkey"), ms(col("o_orderdate")).as("st"),
              (ms(col("o_orderdate")) + 7 * DayMs).as("en")),
          col("pt") >= col("st") && col("pt") < col("en"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_ship"),
          graft.ops.Relational.dsum(col("l_extendedprice"), 2).as("sum_price"))
        .orderBy("o_orderkey")
      assert(!nested(auto), "rule must fire on the naive formulation")
      assert(auto.collect().map(_.toSeq).toSeq == oracled)
    }
  }

  test("an equi conjunct disables the rewrite (hash join already exists)") {
    val p2 = points.withColumn("k", col("pt") % 2)
    val i2 = intervals.withColumn("k", col("iid") % 2)
    withBin(100L) {
      val df = p2.join(i2,
        p2("k") === i2("k") && col("pt") >= col("start") && col("pt") < col("end"))
      val plan = planOf(df)
      assert(!plan.contains("__graft_pbin"), s"rule must not fire on an equi join:\n$plan")
    }
  }

  // ---- interval × interval OVERLAP rewrite ---------------------------

  private def lIv = Seq(
    (1L, 0L, 100L), (2L, 90L, 210L), (3L, 500L, 501L),
    (4L, 300L, 300L),   // empty
    (5L, 700L, 600L))   // inverted — must keep BNLJ semantics
    .toDF("lid", "ls", "le")
  private def rIv = Seq(
    (10L, 50L, 60L), (11L, 95L, 400L), (12L, 600L, 650L),
    (13L, 150L, 150L),  // empty
    (14L, 800L, 550L))  // inverted
    .toDF("rid", "rs", "re")

  test("overlap join: BNLJ without the rule, bin equi-join with it, identical incl. inverted intervals") {
    for ((c1, c2) <- Seq(
        (col("ls") < col("re"), col("rs") < col("le")),   // strict
        (col("ls") <= col("re"), col("rs") <= col("le")), // inclusive
        (col("re") > col("ls"), col("le") > col("rs")))) { // mirrored
      val cond = c1 && c2
      val naive = lIv.join(rIv, cond)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      withBin(100L) {
        val rewritten = lIv.join(rIv, cond)
        assert(!nested(rewritten), s"overlap rule must delete the BNLJ:\n${planOf(rewritten)}")
        val rows = rewritten.select("lid", "rid").as[(Long, Long)].collect()
        assert(rows.toSet == naive, s"got ${rows.toSet} want $naive")
        assert(rows.length == naive.size, "each overlapping pair exactly once")
      }
    }
  }

  test("overlap rewrite ≡ the DuckDB-oracled explicit helper on the gate data") {
    val sf = "/root/testdata/sf0.001"
    import graft.ops.Tables
    val DayMs = 86400000L
    def ms(c: org.apache.spark.sql.Column) = unix_millis(c.cast("timestamp"))
    val oracled = graft.ops.Relational.q_join_overlap(spark, sf)
      .collect().map(_.toSeq).toSeq
    withBin(7 * DayMs) {
      val l = Tables.orders(spark, sf).filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey"), ms(col("o_orderdate")).as("s1"),
          (ms(col("o_orderdate")) + 7 * DayMs).as("e1"))
      val r = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 100 === 0)
        .select(col("l_quantity"), ms(col("l_shipdate")).as("s2"),
          (ms(col("l_shipdate")) + col("l_linenumber").cast("long") * DayMs).as("e2"))
      val auto = l.join(r, col("s1") < col("e2") && col("s2") < col("e1"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_overlap"),
          graft.ops.Relational.dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderkey")
      assert(!nested(auto), "overlap rule must fire on the naive formulation")
      assert(auto.collect().map(_.toSeq).toSeq == oracled)
    }
  }

  test("2-D overlap: the plain-attribute dimension is binned, deterministically") {
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    // lz/rz are genuine zero COLUMNS (a literal +0 would be constant-
    // folded away before the rule runs in extraOptimizations)
    val l2d = Seq((1L, 0L, 100L, 10L, 20L, 0L), (2L, 50L, 150L, 15L, 30L, 0L),
        (3L, 200L, 300L, 100L, 120L, 0L))
      .toDF("lid", "ls1", "le1", "ls2", "le2", "lz")
    val r2d = Seq((10L, 90L, 110L, 12L, 18L, 0L), (20L, 140L, 260L, 110L, 115L, 0L),
        (30L, 400L, 500L, 0L, 5L, 0L))
      .toDF("rid", "rs1", "re1", "rs2", "re2", "rz")
    // dimension 1 deliberately COMPUTED (+zero column) and listed FIRST:
    // a naive first-match pairing would bin it; the plainness rule must
    // pick the plain-attribute dimension 2 instead, and stably so
    val cond = (col("ls1") + col("lz")) < col("re1") &&
      (col("rs1") + col("rz")) < col("le1") &&
      col("ls2") < col("re2") && col("rs2") < col("le2")
    val naive = l2d.join(r2d, cond).select("lid", "rid").as[(Long, Long)].collect().toSet
    withBin(10L) {
      // twice: the dimension choice must be stable across plannings
      // (exprIds differ run-to-run, the REFERENCED COLUMNS must not)
      for (_ <- 1 to 2) {
        val rewritten = l2d.join(r2d, cond)
        val gens = rewritten.queryExecution.optimizedPlan.collect { case g: Generate => g }
        assert(gens.nonEmpty, "overlap rewrite must fire")
        val binRefs = gens.flatMap(_.generator.references.toSeq.map(_.name)).toSet
        assert(binRefs == Set("ls2", "le2", "rs2", "re2"),
          s"the plain dimension must be the binned one, got refs $binRefs")
        assert(rewritten.select("lid", "rid").as[(Long, Long)].collect().toSet == naive)
      }
    }
  }

  test("overlap kill-switch: spark.graft.rangeJoin.overlap.enabled=false declines the rewrite") {
    val cond = col("ls") < col("re") && col("rs") < col("le")
    val naive = lIv.join(rIv, cond).select("lid", "rid").as[(Long, Long)].collect().toSet
    withBin(100L) {
      try {
        spark.conf.set("spark.graft.rangeJoin.overlap.enabled", "false")
        val declined = lIv.join(rIv, cond)
        assert(!planOf(declined).contains("__graft_lbin"),
          "overlap rewrite must be off under the kill-switch")
        assert(declined.select("lid", "rid").as[(Long, Long)].collect().toSet == naive)
        // the point-in-interval rewrite is NOT affected by the switch
        val pt = points.join(intervals, col("pt") >= col("start") && col("pt") < col("end"))
        assert(!nested(pt), "point-in-interval rewrite must stay on")
      } finally spark.conf.unset("spark.graft.rangeJoin.overlap.enabled")
    }
  }

  test("wide-span guard: a pathological interval raises an actionable error, not a silent blowup") {
    // one row 10^9 domain units wide: at binSize=100 that is 10^7 bins —
    // over a maxBinsPerRow of 1000 it must ERROR with the conf names,
    // not silently replicate the row ten million times
    val patho = Seq((1L, 0L, 1000000000L)).toDF("iid", "start", "end")
    withBin(100L) {
      try {
        spark.conf.set("spark.graft.rangeJoin.maxBinsPerRow", "1000")
        // point-in-interval path
        val pt = points.join(patho,
          col("pt") >= col("start") && col("pt") < col("end"))
        val e1 = intercept[Exception](pt.collect())
        assert(e1.getMessage.contains("maxBinsPerRow"),
          s"error must name the conf: ${e1.getMessage}")
        assert(e1.getMessage.contains("binSize"),
          s"error must point at the fix: ${e1.getMessage}")
        // overlap path
        val ov = patho.select(col("start").as("ls"), col("end").as("le"))
          .join(rIv, col("ls") < col("re") && col("rs") < col("le"))
        val e2 = intercept[Exception](ov.collect())
        assert(e2.getMessage.contains("maxBinsPerRow"))
        // raising the cap clears the guard; results match the naive join
        spark.conf.set("spark.graft.rangeJoin.maxBinsPerRow", "100000000")
        val got = points.join(patho,
            col("pt") >= col("start") && col("pt") < col("end"))
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val naive = points.crossJoin(patho)
          .filter(col("pt") >= col("start") && col("pt") < col("end"))
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        assert(got == naive)
        // guard off (0 = unlimited) also declines to error
        spark.conf.set("spark.graft.rangeJoin.maxBinsPerRow", "0")
        assert(points.join(patho,
          col("pt") >= col("start") && col("pt") < col("end")).count() == naive.size)
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBinsPerRow")
    }
    // default cap (2^20) is generous: the normal gate fixtures never trip it
    withBin(100L) {
      assert(points.join(intervals,
        col("pt") >= col("start") && col("pt") < col("end")).count() > 0)
    }
  }

  test("overlap rewrite declines semi joins and equi-keyed joins") {
    withBin(100L) {
      val semi = lIv.join(rIv,
        col("ls") < col("re") && col("rs") < col("le"), "left_semi")
      assert(!planOf(semi).contains("__graft_lbin"),
        "semi join multiplicities must not be rewritten")
      val l2 = lIv.withColumn("k", col("lid") % 2)
      val r2 = rIv.withColumn("k", col("rid") % 2)
      val equi = l2.join(r2,
        l2("k") === r2("k") && col("ls") < col("re") && col("rs") < col("le"))
      assert(!planOf(equi).contains("__graft_lbin"),
        "an equi conjunct already gives a hash join")
    }
  }
}
