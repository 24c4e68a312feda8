package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed aggregators (`Aggregator[IN, BUF, OUT]` — the modern
  * UDAF surface). Buffers are tiny case classes; partial aggregation
  * (map-side combine) comes for free from the Aggregator contract, so
  * these scale like built-in aggs: one shuffle of small buffers, never
  * of raw rows.
  */
object Udafs {
  import Tables._

  case class GeoBuf(var logSum: Double, var n: Long)

  /** Geometric mean via exp(mean(ln x)) — streaming-safe, merge-able. */
  object GeometricMean extends Aggregator[Double, GeoBuf, Double] {
    override def zero: GeoBuf = GeoBuf(0.0, 0L)
    override def reduce(b: GeoBuf, x: Double): GeoBuf = {
      b.logSum += math.log(x); b.n += 1; b
    }
    override def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.logSum + b.logSum, a.n + b.n)
    override def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
    override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  case class LiKey(price: Double, orderkey: Long, linenumber: Int)

  /** Bounded top-k aggregate: keeps the k smallest elements under
    * (-price, orderkey, linenumber) — i.e. top-k by price desc with
    * deterministic tie-breaks. The buffer never exceeds k rows, so the
    * map-side partial aggregation reduces each input partition to ≤k rows
    * per group BEFORE the shuffle — per-group top-k without shuffling or
    * sorting the fact table (Spark has no built-in per-group top-k;
    * `TakeOrderedAndProject` is global-only).
    */
  class TopKByPrice(k: Int) extends Aggregator[LiKey, List[LiKey], Seq[LiKey]] {
    private def lt(a: LiKey, b: LiKey): Boolean =
      a.price > b.price ||
        (a.price == b.price &&
          (a.orderkey < b.orderkey ||
            (a.orderkey == b.orderkey && a.linenumber < b.linenumber)))
    private def insert(b: List[LiKey], x: LiKey): List[LiKey] = {
      // k is tiny (≤ ~100): sorted-list insertion, truncate to k
      val (pre, post) = b.span(e => lt(e, x))
      val merged = pre ::: (x :: post)
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: List[LiKey] = Nil
    override def reduce(b: List[LiKey], a: LiKey): List[LiKey] =
      if (b.length == k && lt(b.last, a)) b else insert(b, a)
    override def merge(a: List[LiKey], b: List[LiKey]): List[LiKey] =
      b.foldLeft(a)((acc, x) => if (acc.length == k && lt(acc.last, x)) acc else insert(acc, x))
    override def finish(b: List[LiKey]): Seq[LiKey] = b
    override def bufferEncoder: Encoder[List[LiKey]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[LiKey]]()
    override def outputEncoder: Encoder[Seq[LiKey]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[LiKey]]()
  }

  case class VecBuf(var sums: Array[Double], var n: Long)

  /** Element-wise vector sum + count: the centroid-update aggregate for
    * Lloyd iterations (k-means, IVF quantizer training). A JVM while-
    * loop per row instead of posexplode — the n·dim intermediate rows
    * are never materialized, and the shuffle moves only k·partitions
    * (dim)-length partial buffers. At 100 TB this turns the per-
    * iteration cost from "hash-aggregate n·dim rows" into "one array
    * add per row".
    */
  object VecSum extends Aggregator[Seq[Double], VecBuf, (Seq[Double], Long)] {
    override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)
    override def reduce(b: VecBuf, x: Seq[Double]): VecBuf = {
      if (b.sums.length == 0) b.sums = new Array[Double](x.length)
      var i = 0
      while (i < x.length && i < b.sums.length) { b.sums(i) += x(i); i += 1 }
      b.n += 1; b
    }
    override def merge(a: VecBuf, b: VecBuf): VecBuf =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        var i = 0
        while (i < a.sums.length && i < b.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.n += b.n; a
      }
    override def finish(b: VecBuf): (Seq[Double], Long) = (b.sums.toSeq, b.n)
    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[(Seq[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Long)]()
  }

  case class TDigestBuf(var means: Array[Double], var weights: Array[Long])

  /** Merging t-digest (Dunning & Ertl) as a typed Aggregator — the
    * wide-frame scale path `q_window_median`'s scaladoc names: an exact
    * rolling median buffers the whole frame per row, while the digest
    * carries ≤ ~δ centroids regardless of frame width, and merges
    * associatively (partial aggregation / sketch persistence both work).
    *
    * Two regimes, both load-bearing:
    *  - EXACT below first compression: up to `MaxBuffer` points every
    *    input is its own singleton centroid and `finish` computes the
    *    standard interpolated median (percentile_cont semantics,
    *    bit-identical to Spark's `percentile` and DuckDB's windowed
    *    `median`) — so the ±50-frame gate query is hash-exact against a
    *    plain SQL oracle.
    *  - APPROX beyond: the merging pass bounds centroid count via the
    *    k1 scale function (clusters sized ∝ q(1-q), tight at the tails);
    *    UdafsSpec gates the rank error on a 20k-point adversarial mix.
    *
    * Compression sorts by mean and merges adjacent clusters greedily —
    * one O(m log m) pass per `MaxBuffer` inputs, amortized O(log m) per
    * point. The buffer encodes as two flat arrays (no per-centroid
    * object rows on the shuffle).
    *
    * COST NOTE, sliding windows: Spark's window exec has no retract
    * path for Aggregators, so a `rowsBetween` frame RE-ACCUMULATES the
    * whole frame per output row — O(frame) per row regardless of the
    * digest's bounded state. The digest's wins on a sliding frame are
    * memory (≤ ~δ centroids live vs the whole frame buffered by exact
    * `percentile`) and the merge path (partial aggregation, sketch
    * persistence, grouped — not windowed — rollups at 100 TB); it is
    * NOT asymptotically faster per window row. TDigestSpec's
    * distributed gate measures the compressing regime under exactly
    * this machinery.
    */
  class TDigestMedian(delta: Int) extends Aggregator[Double, TDigestBuf, Double] {
    private val MaxBuffer = 4 * delta

    override def zero: TDigestBuf = TDigestBuf(Array.emptyDoubleArray, Array.emptyLongArray)

    override def reduce(b: TDigestBuf, x: Double): TDigestBuf = {
      val n = b.means.length
      val m = java.util.Arrays.copyOf(b.means, n + 1)
      val w = java.util.Arrays.copyOf(b.weights, n + 1)
      m(n) = x; w(n) = 1L
      b.means = m; b.weights = w
      if (b.means.length > MaxBuffer) compress(b) else b
    }

    override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
      if (a.means.isEmpty) return b
      if (b.means.isEmpty) return a
      val m = new Array[Double](a.means.length + b.means.length)
      val w = new Array[Long](m.length)
      System.arraycopy(a.means, 0, m, 0, a.means.length)
      System.arraycopy(b.means, 0, m, a.means.length, b.means.length)
      System.arraycopy(a.weights, 0, w, 0, a.weights.length)
      System.arraycopy(b.weights, 0, w, a.weights.length, b.weights.length)
      val out = TDigestBuf(m, w)
      if (out.means.length > MaxBuffer) compress(out) else out
    }

    /** k1 scale: max cluster weight at quantile q is
      * 4·N·q(1−q)/δ — the classic bound keeping tails singleton-ish.
      */
    private def compress(b: TDigestBuf): TDigestBuf = {
      val idx = b.means.indices.sortBy(b.means)
      val total = b.weights.sum
      val ms = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ws = scala.collection.mutable.ArrayBuffer.empty[Long]
      var curSum = 0.0; var curW = 0L; var cumBefore = 0L
      idx.foreach { i =>
        val wi = b.weights(i)
        val qMid = (cumBefore + curW + wi / 2.0) / total
        val cap = math.max(1.0, 4.0 * total * qMid * (1.0 - qMid) / delta)
        if (curW > 0 && curW + wi > cap) {
          ms += curSum / curW; ws += curW
          cumBefore += curW; curSum = 0.0; curW = 0L
        }
        curSum += b.means(i) * wi; curW += wi
      }
      if (curW > 0) { ms += curSum / curW; ws += curW }
      b.means = ms.toArray; b.weights = ws.toArray
      b
    }

    override def finish(b: TDigestBuf): Double = {
      if (b.means.isEmpty) return Double.NaN
      val idx = b.means.indices.sortBy(b.means).toArray
      val allSingleton = b.weights.forall(_ == 1L)
      if (allSingleton) {
        // exact regime: standard percentile_cont(0.5) interpolation
        val n = b.means.length
        val r = 0.5 * (n - 1)
        val lo = r.toInt; val hi = math.min(lo + 1, n - 1)
        val frac = r - lo
        val a = b.means(idx(lo)); val c = b.means(idx(hi))
        a + frac * (c - a)
      } else {
        // centroid interpolation: piecewise linear between adjacent
        // centroid means at their cumulative-weight midpoints
        val total = b.weights.sum.toDouble
        val target = 0.5 * total
        var cum = 0.0
        var k = 0
        while (k < idx.length) {
          val i = idx(k)
          val mid = cum + b.weights(i) / 2.0
          if (mid >= target) {
            if (k == 0) return b.means(i)
            val j = idx(k - 1)
            val prevMid = cum - b.weights(j) / 2.0
            val frac = (target - prevMid) / (mid - prevMid)
            return b.means(j) + frac * (b.means(i) - b.means(j))
          }
          cum += b.weights(i)
          k += 1
        }
        b.means(idx.last)
      }
    }

    override def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def q_udaf_custom(s: SparkSession, d: String): DataFrame = {
    val geoMean = udaf(GeometricMean)
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        round(geoMean(col("o_totalprice")), 4).as("geo_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }
}
