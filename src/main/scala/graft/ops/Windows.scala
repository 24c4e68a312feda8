package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-window aggregation over the `events` table using the same
  * `window()` / `session_window()` operators Structured Streaming uses —
  * these queries run identically in batch (DuckDB-verifiable, what the
  * driver checks) and behind `readStream` (exercised in
  * StreamingSpec with MemoryStream + watermarks).
  *
  * Window starts are surfaced as epoch seconds (BIGINT) — timestamp
  * round-tripping through two engines' TZ handling is the classic parity
  * trap, epoch integers are unambiguous.
  */
object Windows {
  import Tables._
  import Relational.dsum

  /** Tumbling 10-minute windows per event_type. */
  def q_stream_tumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("value_sum"))
      .select(
        col("w.start").cast("long").as("window_start_epoch"),
        col("event_type"), col("n"), col("value_sum"))
      .orderBy("window_start_epoch", "event_type")

  /** Sliding 10-minute windows every 5 minutes (each event lands in 2). */
  def q_stream_sliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("w.start").cast("long").as("window_start_epoch"),
        col("event_type"), col("n"))
      .orderBy("window_start_epoch", "event_type")

  /** Session windows: 30-minute inactivity gap per user. A session
    * absorbs an event iff ts < prev_ts + gap (half-open window), which
    * the oracle mirrors as a gaps-and-islands `>= gap starts new`.
    */
  def q_stream_session(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("value_sum"))
      .select(
        col("user_id"),
        col("w.start").cast("long").as("session_start_epoch"),
        col("n_events"), col("value_sum"))
      .orderBy("user_id", "session_start_epoch")
}
