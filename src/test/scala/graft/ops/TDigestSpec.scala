package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The t-digest median's two regimes: bit-exact interpolated median
  * below first compression (the gate regime — hash-exact vs DuckDB),
  * bounded rank error after compression (the 100 TB wide-frame regime).
  */
class TDigestSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def exactMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val r = 0.5 * (s.length - 1)
    val lo = r.toInt; val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (r - lo) * (s(hi) - s(lo))
  }

  private def digestOf(agg: Udafs.TDigestMedian, xs: Seq[Double]): Double = {
    // driver-side replay of the Aggregator contract, split across two
    // partial buffers to exercise merge()
    val (l, r) = xs.splitAt(xs.length / 2)
    val a = l.foldLeft(agg.zero)(agg.reduce)
    val b = r.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(a, b))
  }

  test("exact regime: bit-identical to interpolated percentile below first compression") {
    val agg = new Udafs.TDigestMedian(200)
    val rng = new scala.util.Random(7)
    Seq(1, 2, 7, 100, 101, 500).foreach { n =>
      val xs = Seq.fill(n)(rng.nextDouble() * 1000 - 500)
      assert(digestOf(agg, xs) == exactMedian(xs), s"n=$n")
    }
  }

  test("approx regime: rank error bounded after compression on adversarial mixes") {
    val agg = new Udafs.TDigestMedian(200)
    val rng = new scala.util.Random(11)
    // uniform + lognormal + a point mass: 20k values, far above MaxBuffer
    val xs = Seq.fill(8000)(rng.nextDouble() * 100) ++
      Seq.fill(8000)(math.exp(rng.nextGaussian() * 2)) ++
      Seq.fill(4000)(42.0)
    val est = digestOf(agg, xs)
    val sorted = xs.sorted
    // rank of the estimate must be within 1% of the true median rank
    val rank = sorted.count(_ <= est).toDouble / sorted.length
    assert(math.abs(rank - 0.5) <= 0.01, s"rank $rank for est $est")
  }

  test("merge is order-insensitive enough for partial aggregation (same exact value pre-compression)") {
    val agg = new Udafs.TDigestMedian(200)
    val xs = (1 to 300).map(_.toDouble * 1.5)
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val parts = xs.grouped(50).map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
    assert(agg.finish(whole) == agg.finish(parts))
    assert(agg.finish(whole) == exactMedian(xs))
  }

  test("approx regime DISTRIBUTED: 1% rank bound on a compressing frame (±600 ≫ 4δ)") {
    // The driver-replay approx test exercises the same kernel, but not
    // the Aggregator running under Spark's window machinery (ObjectAgg
    // buffer encode/decode per partial, frame re-accumulation). Run a
    // GLOBAL ±600 frame — 1201 rows ≫ MaxBuffer = 4δ = 800, so every
    // interior row's digest has compressed at least once — and assert
    // the estimate's rank within its own frame stays within 1% of the
    // true median rank, the same bound the driver-replay test holds.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.01"
    val td = udaf(new Udafs.TDigestMedian(200))
    val base = Tables.events(spark, sf)
      .select(col("event_id"), col("value"))
      .orderBy("event_id").limit(2500)
    val w = Window.orderBy("event_id").rowsBetween(-600, 600)
    val rows = base
      .withColumn("est", td(col("value")).over(w))
      .withColumn("fvals", collect_list(col("value")).over(w))
      .select(col("est"), col("fvals"))
      .collect()
    assert(rows.length == 2500)
    assert(rows.exists(_.getSeq[Double](1).length > 800), "no frame reached compression")
    rows.foreach { r =>
      val est = r.getDouble(0)
      val fv = r.getSeq[Double](1)
      val rank = fv.count(_ <= est).toDouble / fv.length
      assert(math.abs(rank - 0.5) <= 0.01,
        s"rank $rank for est $est over frame of ${fv.length}")
    }
  }

  test("q_window_median_wide ≡ exact percentile window at gate scale") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-50, 50)
    val got = Relational.q_window_median_wide(spark, sf)
    val exp = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("med101", round(percentile(col("value"), lit(0.5)).over(w) + lit(1e-9), 4))
      .orderBy("event_id")
    assert(got.except(exp).count() == 0 && exp.except(got).count() == 0)
    assert(got.count() > 0)
  }
}
