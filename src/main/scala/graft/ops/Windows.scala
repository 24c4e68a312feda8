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

  /** Per-window distribution DRIFT monitor: hourly tumbling windows of
    * the event-type mix, each scored with its PSI against the
    * whole-corpus baseline — the batch-verifiable form of a streaming
    * drift alarm (the identical `window()` plan runs behind
    * `readStream`; in production the baseline is a broadcast reference
    * snapshot instead of the same pass). Laplace-smoothed
    * probabilities (+0.5 per cell) keep zero-count window cells
    * finite, the window×type grid is completed by a broadcast cross
    * join so silent cells still contribute, and per-type PSI terms are
    * rounded then DECIMAL-summed (order-independent). One corpus scan
    * feeds both the windowed counts and the baseline.
    */
  def q_stream_drift(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val win = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("window_start_epoch"),
        col("event_type"), col("n"))
    val base = ev.groupBy("event_type").agg(count(lit(1)).as("n_base"))
    val tot = ev.groupBy().agg(
      count(lit(1)).as("n_tot"), countDistinct(col("event_type")).as("k_types"))
    val winTot = win.groupBy("window_start_epoch").agg(sum("n").as("n_win"))
    winTot.crossJoin(broadcast(base))
      .join(win, Seq("window_start_epoch", "event_type"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn("p_win", (col("n") + 0.5) / (col("n_win") + lit(0.5) * col("k_types")))
      .withColumn("p_base", (col("n_base") + 0.5) / (col("n_tot") + lit(0.5) * col("k_types")))
      .withColumn("psi_term",
        round((col("p_win") - col("p_base")) * log(col("p_win") / col("p_base"))
          + lit(1e-9), 6).cast(DecimalType(18, 6)))
      .groupBy("window_start_epoch")
      .agg(sum("n").as("n_events"), sum(col("psi_term")).cast("double").as("psi"))
      .orderBy("window_start_epoch")
  }

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
