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
  /** `events.ts` arrives in one of two parquet encodings depending on
    * the generator vintage, and BOTH are normalized here to the same
    * two-column contract:
    *   - `ts_ns` LongType: exact epoch nanoseconds (use for ordering /
    *     as-of comparisons that must match a ns-precision oracle —
    *     DuckDB's `epoch_ns()` yields the identical value for either
    *     encoding);
    *   - `ts` TimestampType: microsecond instant (use for window() /
    *     session_window()).
    *
    * Encodings: TIMESTAMP(NANOS) — finer than Spark's microsecond
    * `TimestampType`, rejected by the reader unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set once in
    * GraftSession.configure, never mutated here) surfaces it as a raw
    * LongType of nanos; or plain TIMESTAMP(MICROS), which Spark reads
    * as timestamp (NTZ when the file is written without UTC
    * normalization — cast to TimestampType interprets the wall-clock in
    * the session's UTC zone, matching DuckDB's naive-timestamp reads).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as raw longs
        raw.withColumn("ts_ns", col("ts").cast("long"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // TIMESTAMP(MICROS), tz-less or instant
        val tsMicro = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        raw.withColumn("ts_ns", unix_micros(tsMicro) * lit(1000L))
          .withColumn("ts", tsMicro)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
