package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers over the driver-generated star schema
  * (TESTDATA.md / FIXTURES.md). Plain `spark.read.parquet` — Catalyst
  * pushes filters and prunes columns into these scans; at cluster scale
  * the same call reads a partitioned table, so nothing here assumes
  * single-file inputs.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) — finer than Spark's
    * microsecond `TimestampType`, rejected by the reader outright. The
    * session must have `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set once in GraftSession.configure — NOT mutated here, so reads
    * are order-independent and the flag never leaks as a side effect
    * of building a plan). We read nanos as raw longs and expose BOTH:
    *   - `ts_ns` LongType: exact nanoseconds (use for ordering /
    *     as-of comparisons that must match a ns-precision oracle);
    *   - `ts` TimestampType: micro-truncated (use for window() /
    *     session_window() — sub-µs truncation can't move an event
    *     across any >=1s window boundary).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(
      s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet has TIMESTAMP(NANOS); build the session via GraftSession " +
        "(sets spark.sql.legacy.parquet.nanosAsLong=true)")
    apply(s, d, "events")
      .withColumn("ts_ns", col("ts").cast("long"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
