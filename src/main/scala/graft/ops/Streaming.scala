package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A single event row for typed stateful streaming ops (mirrors the
  * `events` table, FIXTURES.md).
  */
case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double, ts: Timestamp)

/** Emitted session record from stateful sessionization. */
case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                      n_events: Long, value_sum: Double)

/** Open-session accumulator kept in `GroupState` between micro-batches. */
case class SessionState(startMs: Long, endMs: Long, n: Long, sum: Double)

/** Structured Streaming operator surface (SURVEY.md §2.B streaming rows):
  * watermarked windowed aggregation, session windows, stateful dedup, and
  * custom sessionization via `flatMapGroupsWithState`.
  *
  * Every transform here takes a (possibly streaming) `DataFrame` and
  * returns one — the same code path runs under `readStream` (exercised in
  * StreamingSpec with `MemoryStream`) and in batch where the operator
  * allows it. State scale design: all state is keyed (windows by
  * `(window, event_type)`, sessions by `user_id`), so at 100 TB/day the
  * state store shards across executors on the grouping key; watermarks
  * bound state size by evicting windows/sessions older than the allowed
  * lateness.
  */
object Streaming {

  /** Watermarked tumbling-window counts. In append mode a window emits
    * only once the watermark passes its end — late events beyond the
    * watermark are dropped, bounding state.
    */
  def tumblingCounts(events: DataFrame, window_ : String = "10 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("value_sum"))

  /** Watermarked tumbling-window streaming PERCENTILE via the t-digest
    * sketch ([[Udafs.TDigestMedian]]): the same mergeable-centroid
    * aggregator that serves the wide batch window frame runs as a
    * streaming aggregation — each micro-batch folds its events into the
    * window's digest through the partial-merge path (`Aggregator.merge`,
    * exactly what the state store needs), so per-window state is a
    * BOUNDED centroid set no matter how many events the window sees.
    * This is the 100 TB/day shape for "p50 latency per 10-minute
    * window": exact percentile would buffer every value per window;
    * the digest holds ≤4δ centroids. Exact below first compression
    * (the gate regime, TDigestSpec); 1% rank error beyond.
    */
  def tumblingMedian(events: DataFrame, window_ : String = "10 minutes",
                     watermark: String = "10 minutes"): DataFrame = {
    val td = udaf(new Udafs.TDigestMedian(200))
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(td(col("value")) + lit(1e-9), 4).as("p50"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("p50"))
  }

  /** Daily percentile bands (time-resolved p50/p90/p99 per event type)
    * over an event stream — the streaming twin of the oracled batch
    * gate [[Relational.q_percentile_bands]], EXACT rather than sketch:
    * per (type, day) window the day's values accumulate in the window's
    * aggregation state (bounded by one day's per-type volume — the same
    * bound the batch gate's percentile sort pays per group) and the
    * gate's interpolation formula `a[⌊i⌋] + (i−⌊i⌋)·(a[⌈i⌉]−a[⌊i⌋])`,
    * i = (n−1)·p, runs at emission over the sorted array — so finalized
    * stream rows are BIT-EQUAL to the batch gate on the same inputs
    * (StreamingSpec pins stream == gate; the same function applied to a
    * batch frame is the gate's formulation modulo `window()` vs
    * `to_date()`). For unbounded per-day volume swap the collect for
    * the t-digest form ([[tumblingMedian]]) — the trade is exactness,
    * same plan shape.
    */
  def dailyPercentileBands(events: DataFrame,
                           watermark: String = "1 day"): DataFrame = {
    def pct(p: Double) = {
      val idx = lit(1.0) + (size(col("vs")) - 1).cast("double") * lit(p)
      val vlo = element_at(col("vs"), floor(idx).cast("int"))
      val vhi = element_at(col("vs"), ceil(idx).cast("int"))
      round(vlo + (idx - floor(idx)) * (vhi - vlo) + lit(1e-9), 4)
    }
    events
      .withColumn("v", col("value")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4)).cast("double"))
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"), collect_list(col("v")).as("vs0"))
      .withColumn("vs", sort_array(col("vs0")))
      .select(col("event_type"), to_date(col("w.start")).as("day"), col("n"),
        pct(0.5).as("p50"), pct(0.9).as("p90"), pct(0.99).as("p99"))
  }

  /** Watermarked session windows (built-in `session_window`): a session
    * closes when the watermark passes last-event-ts + gap.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("value_sum"))

  /** Stateful exact dedup on event_id with bounded state: duplicates are
    * dropped as long as they arrive within the watermark delay of the
    * first occurrence; state for older keys is evicted. The streaming
    * twin of `q_dedup_exact`.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup ingest screen: incoming documents dedup on
    * their 64-bit SimHash signature (native codegen kernel) within the
    * watermark — exact duplicates and near-identical boilerplate whose
    * signature collides collapse AT INGEST, with state bounded to one
    * (sig → seen) entry per distinct signature inside the watermark
    * horizon. Signature EQUALITY is the streaming-compatible gate (a
    * banded hamming screen needs a reshuffle per band — that full
    * sweep runs downstream in batch, `Llm.minhashPairs`/`q_mm_phash`);
    * this is the cheap front door that stops the floods.
    */
  def nearDupDedupWithinWatermark(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("simhash", graft.functions.Vec.simhash(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Stream-stream join: click events joined to the purchases that
    * follow them within `window_` for the same user. Both sides carry
    * watermarks and the join condition bounds the time skew, so each
    * side's buffered state is evicted once the other side's watermark
    * passes the constraint — bounded state, the requirement for
    * unbounded-stream joins.
    */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                          window_ : String = "10 minutes",
                          watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $window_"))
      .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
  }

  /** Running per-user totals via `transformWithState` — Spark 4's
    * arbitrary-stateful-processing API (StatefulProcessor + typed state
    * variables over the RocksDB state store, the successor to
    * `flatMapGroupsWithState`). Emits the updated running (count, sum)
    * for each user on every micro-batch that touches them. State here is
    * UNBOUNDED (`TTLConfig.NONE` — running totals must never expire);
    * pass a TTL for state that may be evicted.
    */
  class RunningTotalsProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Ev, (Long, Long, Double)] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.product[(Long, Double)], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, sum) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; sum += e.value }
      totals.update((n, sum))
      Iterator.single((key, n, sum))
    }
  }

  /** Streaming EWMA anomaly monitor via `transformWithState`: per key,
    * a ValueState carries exponential moments (n, ewma, ewvar) and each
    * arriving value is flagged BEFORE it updates them —
    * |x − ewma| > k·√ewvar after `warmup` observations (the control-
    * chart rule over West-1979 exponential moment updates:
    * d = x − ewma; ewma += α·d; ewvar = (1−α)·(ewvar + α·d²)). The
    * streaming sibling of the batch [[Relational.q_window_ewma]]
    * smoother and [[Relational.q_outlier_mad]] screen: O(1) state per
    * key (three numbers in RocksDB), emits every observation with its
    * smoothed value and flag in update mode. Rows fold in arrival
    * order within a micro-batch — callers needing strict event-time
    * order sort upstream or accept per-batch arrival order (standard
    * for monitors).
    */
  class EwmaAnomalyProcessor(alpha: Double = 0.5, k: Double = 3.0, warmup: Int = 3)
      extends StatefulProcessor[Long, Ev, (Long, Long, Double, Double, Boolean)] {
    @transient private var st: ValueState[(Long, Double, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, Double)](
        "moments", Encoders.product[(Long, Double, Double)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[(Long, Long, Double, Double, Boolean)] = {
      var (n, m, v) = if (st.exists()) st.get() else (0L, 0.0, 0.0)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double, Boolean)]()
      rows.foreach { e =>
        if (n == 0) {
          // seed the moments from the first observation — folding from
          // (0, 0) would bias the smoother toward zero for ~1/α steps
          m = e.value; v = 0.0; n = 1
          out += ((key, e.event_id, e.value, m, false))
        } else {
          val anomaly = n >= warmup && math.abs(e.value - m) > k * math.sqrt(v)
          val d = e.value - m
          m += alpha * d
          v = (1 - alpha) * (v + alpha * d * d)
          n += 1
          out += ((key, e.event_id, e.value, m, anomaly))
        }
      }
      st.update((n, m, v))
      out.iterator
    }
  }

  /** `(user_id, event_id, value, ewma, anomaly)` per observation. */
  def ewmaAnomalies(events: Dataset[Ev], alpha: Double = 0.5, k: Double = 3.0,
                    warmup: Int = 3): Dataset[(Long, Long, Double, Double, Boolean)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new EwmaAnomalyProcessor(alpha, k, warmup),
        TimeMode.None(), OutputMode.Update())
  }

  /** Idle-key flush via `transformWithState` EVENT-TIME TIMERS — the
    * Spark 4 timer API (the piece `flatMapGroupsWithState` exposes only
    * as coarse timeouts): each key re-arms ONE timer at
    * last-event-time + idleMs; when the watermark passes it,
    * `handleExpiredTimer` emits the accumulated count and clears state.
    * The abandoned-cart / idle-session pattern. Re-arming deletes the
    * previous timer, so state per key is one counter and one timer —
    * watermark-bounded, never growing with event volume.
    */
  class IdleFlushProcessor(idleMs: Long)
      extends StatefulProcessor[Long, Ev, (Long, Long)] {
    @transient private var count: ValueState[Long] = _
    @transient private var maxSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      // the idle deadline is lastEvent + gap where lastEvent is the max
      // event time EVER seen for the key, not this batch's max: with a
      // nonzero watermark delay an admissible late batch would otherwise
      // re-arm the timer EARLIER than the true last event + gap
      maxSeen = getHandle.getValueState[Long]("maxSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[(Long, Long)] = {
      var n = if (count.exists()) count.get() else 0L
      var maxTs = if (maxSeen.exists()) maxSeen.get() else Long.MinValue
      rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
      count.update(n)
      if (maxTs != Long.MinValue) { // all-empty iterator: nothing to (re-)arm
        maxSeen.update(maxTs)
        getHandle.listTimers().foreach(getHandle.deleteTimer) // re-arm: one live timer
        getHandle.registerTimer(maxTs + idleMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] = {
      val n = if (count.exists()) count.get() else 0L
      count.clear()
      maxSeen.clear()
      Iterator.single((key, n))
    }
  }

  /** Per-key MAP state: running per-(user, event-type) counts in a
    * `MapState` — the typed-state variable for ragged per-key
    * sub-structure (a ValueState of a whole map would rewrite the full
    * map per batch; MapState updates only the touched entries in
    * RocksDB). Emits the updated (user, type, n) rows each batch.
    */
  class TypeCountsProcessor extends StatefulProcessor[Long, Ev, (Long, String, Long)] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val n = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, n + 1)
        touched += e.event_type
      }
      touched.iterator.map(t => (key, t, counts.getValue(t)))
    }
  }

  /** `(user_id, event_type, n)` — updated rows per micro-batch. */
  def typeCounts(events: Dataset[Ev]): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-key LIST state: the last-N event ring per user — the "recent
    * context" feature every personalization / session model reads.
    * `ListState` is the right state variable for an append-mostly
    * bounded buffer: appends write only the new entries in RocksDB
    * (a ValueState of the whole Seq would rewrite all N per batch);
    * the trim rewrites the list only on overflow. Batch rows are
    * sorted (ts, event_id) before appending so ring order is
    * event-time order regardless of shuffle arrival order.
    */
  class LastNProcessor(n: Int) extends StatefulProcessor[Long, Ev, (Long, Seq[Long])] {
    @transient private var ring: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getListState[Long]("ring", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[(Long, Seq[Long])] = {
      val batch = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      ring.appendList(batch.map(e => java.lang.Long.valueOf(e.event_id).longValue()))
      val all = ring.get().toArray
      val kept = if (all.length > n) {
        val k = all.takeRight(n)
        ring.put(k) // overflow: rewrite once, bounded at N entries
        k
      } else all
      Iterator.single((key, kept.toSeq))
    }
  }

  /** `(user_id, last_event_ids)` — the bounded recent-event ring,
    * re-emitted for each touched key per micro-batch.
    */
  def lastN(events: Dataset[Ev], n: Int): Dataset[(Long, Seq[Long])] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new LastNProcessor(n),
        TimeMode.None(), OutputMode.Update())
  }

  /** `(user_id, n_events)` emitted once a user goes idle for `idleMs`.
    * `watermarkDelay` admits late events; the processor keeps the idle
    * deadline anchored to the max event time EVER seen per key, so an
    * admissible late event can never pull the timer earlier.
    */
  def idleFlush(events: Dataset[Ev], idleMs: Long,
                watermarkDelay: String = "0 seconds"): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new IdleFlushProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming WEIGHTED reservoir (Efraimidis–Spirakis A-Res) via
    * `transformWithState` — the streaming sibling of the batch
    * [[Llm.q_sample_weighted]] gate: per key, keep the k items with
    * the largest ln(u)/w reservoir keys seen so far, where u is the
    * md5-derived deterministic uniform of the item id and w its
    * weight. Because the A-Res key is a pure function of (id, w), the
    * reservoir is DETERMINISTIC across retries, replays, and batch
    * boundaries — the defining property a restart-safe streaming
    * sampler needs — and converges to exactly the batch sample over
    * the same ids. State is O(k) doubles+longs per key in RocksDB;
    * each micro-batch emits the key's current reservoir in update
    * mode.
    */
  class WeightedReservoirProcessor(k: Int)
      extends StatefulProcessor[String, Ev, (String, Long, Double)] {
    @transient private var res: ValueState[(Seq[Double], Seq[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      res = getHandle.getValueState[(Seq[Double], Seq[Long])](
        "reservoir", Encoders.product[(Seq[Double], Seq[Long])], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[(String, Long, Double)] = {
      var cur: List[(Double, Long)] =
        if (res.exists()) { val (ks, ids) = res.get(); ks.zip(ids).toList } else Nil
      rows.foreach { e =>
        // at-least-once guard: a re-delivered event_id (same id within or
        // across micro-batches) must not occupy a second reservoir slot —
        // its A-Res key is a pure function of (id, w), so skipping the
        // duplicate leaves the reservoir identical to exactly-once delivery.
        // ASSUMPTION (the standard at-least-once contract): ids are
        // idempotent — a redelivery carries the same weight. An id
        // re-used with a DIFFERENT value is an upstream bug this guard
        // cannot adjudicate (an evicted id re-arriving mutated would
        // re-enter on its new key)
        if (!cur.exists(_._2 == e.event_id)) {
          val kk = Streaming.aresKey(e.event_id, math.max(e.value, 1e-9))
          // (key desc, id asc) total order; keep the top k
          cur = ((kk, e.event_id) :: cur)
            .sortBy { case (x, id) => (-x, id) }.take(k)
        }
      }
      res.update((cur.map(_._1), cur.map(_._2)))
      cur.iterator.map { case (x, id) => (key, id, x) }
    }
  }

  /** ln(u)/w with u = (first 13 md5 hex chars of the id, +1) / 2⁵³+ε —
    * byte-identical to the batch gate's md5/conv formulation.
    */
  def aresKey(id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    math.log((java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370497.0) / w
  }

  /** `(event_type, event_id, ares_key)` — the current per-type
    * reservoir after each micro-batch.
    */
  def weightedReservoir(events: Dataset[Ev], k: Int = 3): Dataset[(String, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new WeightedReservoirProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** `user_id, n_events, value_sum` updated per micro-batch. */
  def runningTotals(events: Dataset[Ev]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Custom sessionization with explicit state — the
    * `flatMapGroupsWithState` escape hatch for semantics the built-in
    * `session_window` can't express (e.g. emitting per-session aggregates
    * with custom close rules). Event-time timeout: an open session is
    * flushed when the watermark passes session_end + gap.
    *
    * Semantics (append output): for each user, events are folded in
    * event-time order into an open session; an event with
    * `ts >= end + gap` closes the current session (emitted immediately)
    * and opens a new one; on timeout the open session is emitted and
    * state cleared.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.n, s.sum))
          } else {
            val sorted = evs.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            var open: Option[SessionState] = state.getOption
            val closed = Vector.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t < s.endMs + gapMs =>
                  open = Some(SessionState(s.startMs, math.max(s.endMs, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.startMs),
                    new Timestamp(s.endMs), s.n, s.sum)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Per-window top-k finisher for streams. Ranking is not allowed on
    * top of a streaming aggregation (the rank of a still-open window
    * would have to retract), so the streaming-correct composition is:
    * watermarked windowed counts in UPDATE mode → `foreachBatch` MERGES
    * the updated (window, type) rows into the serving store → this
    * finisher re-ranks the store's rows. Update mode only re-emits
    * CHANGED rows, so ranking a raw micro-batch would miss unchanged
    * competitors — the rank must run over the merged store (see
    * StreamingSpec's leader-flip scenario). Stream state stays bounded
    * by the watermark; the finisher's input is (windows × types) —
    * dimension-sized, never raw events.
    */
  def topKPerWindow(windowCounts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start")
      .orderBy(col("n").desc, col("event_type"))
    windowCounts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
