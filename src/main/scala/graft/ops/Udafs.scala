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
