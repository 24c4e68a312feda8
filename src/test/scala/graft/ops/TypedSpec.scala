package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed `Dataset[T]` surface (SURVEY.md §1.4: `Dataset[T]` where a typed
  * slice helps): case-class Encoders, typed filter/map, `groupByKey` +
  * typed aggregation — and the guarantee that typed and untyped
  * formulations agree.
  */
case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                 o_totalprice: Double, o_orderpriority: String)

class TypedSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def orders = {
    val s = spark
    import s.implicits._
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .as[Order]
  }

  test("typed filter + map ≡ untyped Column ops") {
    val s = spark
    import s.implicits._
    val typed = orders.filter(_.o_totalprice > 200000).map(_.o_orderkey).collect().sorted
    val untyped = Tables.orders(spark, sf).filter(col("o_totalprice") > 200000)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(typed.toSeq == untyped.toSeq)
  }

  test("groupByKey + typed Aggregator ≡ groupBy agg") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    val roundedSum = new Aggregator[Order, Long, Long] {
      def zero = 0L
      def reduce(b: Long, o: Order) = b + math.round(o.o_totalprice)
      def merge(a: Long, b: Long) = a + b
      def finish(b: Long) = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    val typedResult = orders.groupByKey(_.o_orderpriority)
      .agg(roundedSum.toColumn).collect().toMap
    val untyped = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(sum(round(col("o_totalprice")).cast("long")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typedResult == untyped)
  }

  test("typed joinWith keeps both sides as objects") {
    val s = spark
    import s.implicits._
    val right = orders
    val big = orders.filter(_.o_totalprice > 450000)
    val joined = big.joinWith(right, big("o_custkey") === right("o_custkey"))
    joined.collect().foreach { case (a, b) => assert(a.o_custkey == b.o_custkey) }
  }

  test("cogroup: per-key two-sided reconciliation ≡ outer-join aggregate") {
    val s = spark
    import s.implicits._
    // reconcile each customer's order count against a filtered slice —
    // the arbitrary two-sided per-key logic joins can't express directly
    val all = orders.groupByKey(_.o_custkey)
    val urgent = orders.filter(_.o_orderpriority == "1-URGENT").groupByKey(_.o_custkey)
    val recon = all.cogroup(urgent) { (k, a, b) =>
      val (na, nb) = (a.size, b.size)
      if (na > 0 || nb > 0) Iterator((k, na.toLong, nb.toLong)) else Iterator.empty
    }.collect().map { case (k, na, nb) => k -> ((na, nb)) }.toMap
    val expected = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(count(lit(1)).as("na"),
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("nb"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(recon == expected)
    recon.values.foreach { case (na, nb) => assert(nb <= na) }
  }
}
