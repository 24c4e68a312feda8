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
