package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property-based parity for the keyless-overlap machinery: on RANDOM
  * interval sets — including inverted (end < start), empty, negative,
  * and boundary-touching intervals, under random bin sizes — the
  * `RangeJoinRule` overlap rewrite must emit exactly the pairs the
  * naive nested-loop join emits, each exactly once. This is the
  * adversarial check behind RangeJoinRuleSpec's fixed cases: the
  * charge-once-at-later-start argument has to survive inputs no one
  * hand-picked.
  */
class OverlapPropertySpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val interval: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(-250L, 250L)
    span <- Gen.chooseNum(-120L, 120L) // negative span = inverted interval
  } yield (a, a + span)

  private val intervals: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, interval))

  test("overlap rewrite ≡ nested-loop join on random intervals and bin sizes (strict + inclusive)") {
    val gen = for {
      ls <- intervals
      rs <- intervals
      bin <- Gen.oneOf(1L, 7L, 64L, 100L, 1000L)
      inclusive <- Gen.oneOf(true, false)
    } yield (ls, rs, bin, inclusive)
    check(Prop.forAll(gen) { case (ls, rs, bin, inclusive) =>
      val l = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("lid", "ls", "le")
      val r = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("rid", "rs", "re")
      val cond =
        if (inclusive) col("ls") <= col("re") && col("rs") <= col("le")
        else col("ls") < col("re") && col("rs") < col("le")
      val naive = l.join(r, cond)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      try {
        spark.conf.set("spark.graft.rangeJoin.binSize", bin.toString)
        val rewritten = l.join(r, cond)
        val plan = rewritten.queryExecution.executedPlan.toString
        val fired = plan.contains("__graft_lbin")
        val got = rewritten.select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
        Prop.collect(s"fired=$fired")(got == naive) :| s"bin=$bin incl=$inclusive got=$got want=$naive"
      } finally spark.conf.unset("spark.graft.rangeJoin.binSize")
    }, n = 24)
  }

  test("Scale.binnedOverlapJoin ≡ nested-loop on random VALID intervals (its documented domain)") {
    val validInterval: Gen[(Long, Long)] = for {
      a <- Gen.chooseNum(-250L, 250L)
      span <- Gen.chooseNum(1L, 120L)
    } yield (a, a + span)
    val gen = for {
      ls <- Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, validInterval))
      rs <- Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, validInterval))
      bin <- Gen.oneOf(1L, 32L, 100L)
    } yield (ls, rs, bin)
    check(Prop.forAll(gen) { case (ls, rs, bin) =>
      val l = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("lid", "ls", "le")
      val r = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("rid", "rs", "re")
      val naive = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      val got = graft.ops.Scale
        .binnedOverlapJoin(l, r, "ls", "le", "rs", "re", bin)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      (got == naive) :| s"bin=$bin got=$got want=$naive"
    }, n = 16)
  }
}
