package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics that have no DuckDB oracle
  * (SURVEY.md §5.5): watermark + late-data handling, stateful dedup
  * within watermark, and flatMapGroupsWithState sessionization — all
  * exercised with MemoryStream micro-batches.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark = graft.TestSpark.spark

  private var queries: List[StreamingQuery] = Nil

  override def afterEach(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop())
    queries = Nil
  }

  def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")

  def startQuery(df: org.apache.spark.sql.DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    queries = q :: queries
    q
  }

  test("watermarked tumbling window drops late data and finalizes windows") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = startQuery(Streaming.tumblingCounts(in.toDF(), "10 minutes", "10 minutes"), "tumbling")

    // batch 1: two events in [00:00,00:10), one in [00:10,00:20)
    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 2.0, ts(9)), Ev(3, 2, "click", 4.0, ts(11)))
    q.processAllAvailable()
    // nothing finalized yet (watermark = 00:11 - 10min = 00:01 < 00:10)
    assert(spark.table("tumbling").count() == 0)

    // batch 2: event at 00:31 advances watermark to 00:21 → first two windows close
    in.addData(Ev(4, 2, "click", 8.0, ts(31)))
    q.processAllAvailable()
    val closed = spark.table("tumbling").as[(Timestamp, String, Long, Double)].collect().sortBy(_._1.getTime)
    assert(closed.map(r => (r._1, r._3, r._4)).toSeq ==
      Seq((ts(0), 2L, 3.0), (ts(10), 1L, 4.0)))

    // batch 3: a LATE event for the already-closed first window → dropped
    in.addData(Ev(5, 1, "click", 99.0, ts(2)))
    q.processAllAvailable()
    assert(spark.table("tumbling").count() == 2) // unchanged — late data discarded
  }

  test("streaming t-digest window percentile merges digests across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = startQuery(Streaming.tumblingMedian(in.toDF(), "10 minutes", "10 minutes"), "tdwin")

    // batch 1: three values land in window [00:00,00:10) — median of
    // {1,9,5} would be 5.0 if the window closed now
    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 9.0, ts(3)),
      Ev(3, 2, "click", 5.0, ts(5)), Ev(4, 2, "view", 4.0, ts(11)))
    q.processAllAvailable()
    assert(spark.table("tdwin").count() == 0) // window still open

    // batch 2: two MORE values into the SAME window — the state store
    // must merge this batch's partial digest into batch 1's (the
    // Aggregator.merge path); the median over the union {1,2,3,5,9} is
    // 3.0, NOT batch 2's own median nor batch 1's 5.0. The 00:31 event
    // then advances the watermark and closes both windows.
    in.addData(Ev(5, 1, "click", 3.0, ts(7)), Ev(6, 2, "click", 2.0, ts(8)),
      Ev(7, 2, "view", 8.0, ts(31)))
    q.processAllAvailable()
    val rows = spark.table("tdwin").as[(Timestamp, String, Long, Double)].collect()
      .sortBy(r => (r._1.getTime, r._2))
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((ts(0), "click", 5L, 3.0), (ts(10), "view", 1L, 4.0)))
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches, bounded state") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = startQuery(Streaming.dedupWithinWatermark(in.toDF(), "10 minutes"), "dedup")

    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "view", 2.0, ts(2)))
    q.processAllAvailable()
    // duplicate event_id=1 arriving within the watermark window → dropped
    in.addData(Ev(1, 1, "click", 1.0, ts(3)), Ev(3, 2, "click", 3.0, ts(4)))
    q.processAllAvailable()
    val ids = spark.table("dedup").as[Ev].collect().map(_.event_id).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("streaming near-dup screen: identical texts collapse on simhash across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val boiler = "subscribe to our newsletter for the latest updates and offers today"
    val real = "a genuinely distinct document about distributed query engines and shuffles"
    val in = MemoryStream[(Long, String, Timestamp)]
    val named = in.toDF().toDF("doc_id", "text", "ts")
    val q = startQuery(Streaming.nearDupDedupWithinWatermark(named, "10 minutes"), "neardup")
    in.addData((1L, boiler, ts(1)), (2L, real, ts(2)))
    q.processAllAvailable()
    // the same boilerplate arriving later in-watermark → same simhash → dropped
    in.addData((3L, boiler, ts(3)), (4L, real + " but new", ts(4)))
    q.processAllAvailable()
    val ids = spark.table("neardup").select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"got $ids")
  }

  test("session_window streaming: sessions close when watermark passes end+gap") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = startQuery(Streaming.sessionCounts(in.toDF(), "30 minutes", "10 minutes"), "sessions")

    // user 1: events at 00:00 and 00:10 (one session [00:00, 00:40))
    in.addData(Ev(1, 1, "click", 1.0, ts(0)), Ev(2, 1, "click", 2.0, ts(10)))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0) // still open

    // far-future event advances watermark beyond 00:40 → session emitted
    in.addData(Ev(3, 2, "click", 1.0, ts(120)))
    q.processAllAvailable()
    val rows = spark.table("sessions")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(rows == Seq((1L, ts(0), ts(40), 2L, 3.0)))
  }

  test("flatMapGroupsWithState sessionization: gap split + event-time timeout flush") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val events = in.toDS().withWatermark("ts", "10 minutes").as[Ev]
    val q = startQuery(Streaming.sessionize(events, gapMs = 30 * 60 * 1000L).toDF(), "fmgws")

    // user 1: two events 10min apart (one open session)
    in.addData(Ev(1, 1, "click", 1.0, ts(0)), Ev(2, 1, "click", 2.0, ts(10)))
    q.processAllAvailable()
    assert(spark.table("fmgws").count() == 0)

    // user 1 event at 01:00 (>= 00:10+30min) closes session [00:00,00:10]
    // immediately; user 2's first event opens its own session.
    in.addData(Ev(3, 1, "click", 4.0, ts(60)), Ev(4, 2, "view", 1.0, ts(60)))
    q.processAllAvailable()
    val afterSplit = spark.table("fmgws").as[SessionOut].collect().toSeq
    assert(afterSplit == Seq(SessionOut(1, ts(0), ts(10), 2, 3.0)))

    // far-future event advances watermark past 01:00+gap → both open
    // sessions flushed by event-time timeout.
    in.addData(Ev(5, 3, "click", 0.0, ts(240)))
    q.processAllAvailable()
    val all = spark.table("fmgws").as[SessionOut].collect().sortBy(r => (r.user_id, r.session_start.getTime)).toSeq
    assert(all.contains(SessionOut(1, ts(60), ts(60), 1, 4.0)))
    assert(all.contains(SessionOut(2, ts(60), ts(60), 1, 1.0)))
  }

  test("file-source streaming: readStream over the parquet dir ≡ batch aggregation") {
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    val sf = "/root/testdata/sf0.001"
    // schema must be declared for streaming file sources (no inference
    // pass), and the source must be a DIRECTORY of files
    val batchEvents = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("part-0.parquet"))
    // normalize ts the way Tables.events does, for either encoding
    // (nanos-as-long vintages vs plain µs timestamps)
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val streamedRaw = spark.readStream.schema(rawSchema).parquet(dir.toString)
    val streamed = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        streamedRaw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("CAST(ts AS LONG) div 1000")))
      case _ =>
        streamedRaw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
    val q = Streaming.tumblingCounts(streamed, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("file_stream")
      .outputMode("complete") // complete mode: every window, watermark or not
      .trigger(Trigger.AvailableNow())
      .start()
    queries = q :: queries
    q.awaitTermination(60000)
    val got = spark.table("file_stream")
    val expected = Streaming.tumblingCounts(batchEvents, "10 minutes", "10 minutes")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    assert(got.count() > 0)
  }

  test("streaming daily percentile bands == the oracled batch gate on the same events") {
    import org.apache.spark.sql.streaming.Trigger
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_pbands_src_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("part-0.parquet"))
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val streamedRaw = spark.readStream.schema(rawSchema).parquet(dir.toString)
    val streamed = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        streamedRaw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("CAST(ts AS LONG) div 1000")))
      case _ =>
        streamedRaw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
    val q = Streaming.dailyPercentileBands(streamed)
      .writeStream.format("memory").queryName("pbands")
      .outputMode("complete") // bounded replay: every window, watermark or not
      .trigger(Trigger.AvailableNow())
      .start()
    queries = q :: queries
    q.awaitTermination(60000)
    val got = spark.table("pbands")
    // the oracled gate IS the expectation — stream rows must be
    // bit-equal (same decimal quantize, same interpolation, same round)
    val want = Relational.q_percentile_bands(spark, sf)
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("stream-stream join: purchases within the window match; state stays bounded by watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = startQuery(
      Streaming.clickToPurchaseJoin(clicks.toDF(), purchases.toDF(), "10 minutes", "10 minutes"),
      "ssjoin")

    clicks.addData(Ev(1, 1, "click", 0, ts(0)), Ev(2, 2, "click", 0, ts(0)))
    purchases.addData(
      Ev(10, 1, "purchase", 0, ts(5)),   // within 10 min of click 1 → match
      Ev(11, 2, "purchase", 0, ts(25)),  // 25 min after click 2 → no match
      Ev(12, 3, "purchase", 0, ts(5)))   // no click for user 3 → no match
    q.processAllAvailable()
    // advance both watermarks far enough to finalize and emit
    clicks.addData(Ev(3, 9, "click", 0, ts(120)))
    purchases.addData(Ev(13, 9, "purchase", 0, ts(120)))
    q.processAllAvailable()
    val joined = spark.table("ssjoin").select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(joined.contains((1L, 10L)))
    assert(!joined.exists(_._2 == 11L))
    assert(!joined.exists(_._2 == 12L))
  }

  test("transformWithState: running per-user totals across micro-batches (RocksDB store)") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = startQuery(Streaming.runningTotals(in.toDS())
        .toDF("user_id", "n_events", "value_sum"), "tws")
      // note: memory sink in append/update mode accumulates emitted rows
      in.addData(Ev(1, 1, "click", 1.0, ts(0)), Ev(2, 1, "click", 2.0, ts(1)), Ev(3, 2, "view", 5.0, ts(2)))
      q.processAllAvailable()
      in.addData(Ev(4, 1, "click", 4.0, ts(3)))
      q.processAllAvailable()
      val rows = spark.table("tws").as[(Long, Long, Double)].collect()
      // user 1: batch1 emitted (2, 3.0), batch2 emitted (3, 7.0) — state carried over
      assert(rows.contains((1L, 2L, 3.0)))
      assert(rows.contains((1L, 3L, 7.0)))
      assert(rows.contains((2L, 1L, 5.0)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState: EWMA anomaly monitor flags a cross-batch spike, state carries") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = startQuery(Streaming.ewmaAnomalies(in.toDS())
        .toDF("user_id", "event_id", "value", "ewma", "anomaly"), "ewmaq")
      // batch 1: a stable series — builds the moments, no flags (warmup)
      in.addData(Ev(1, 1, "m", 10.0, ts(0)), Ev(2, 1, "m", 10.2, ts(1)),
        Ev(3, 1, "m", 9.8, ts(2)), Ev(4, 1, "m", 10.1, ts(3)))
      q.processAllAvailable()
      // batch 2: a spike for user 1 (state from batch 1 must be live),
      // and a fresh user whose first points can never flag (warmup)
      in.addData(Ev(5, 1, "m", 50.0, ts(4)), Ev(6, 2, "m", 500.0, ts(5)))
      q.processAllAvailable()
      val rows = spark.table("ewmaq")
        .as[(Long, Long, Double, Double, Boolean)].collect()
        .map(r => r._2 -> r).toMap
      assert(!rows(1)._5 && !rows(2)._5 && !rows(3)._5, "warmup never flags")
      assert(rows(5)._5, "the cross-batch spike must flag — moments persisted in RocksDB")
      assert(!rows(6)._5, "a new key's first observation is warmup, not an anomaly")
      // replay the exponential-moment fold exactly (seeded from x₀)
      var (m, v) = (10.0, 0.0)
      assert(rows(1)._4 == m, "event 1 seeds the ewma")
      Seq(10.2, 9.8, 10.1, 50.0).zipWithIndex.foreach { case (x, i) =>
        val d = x - m
        m += 0.5 * d; v = 0.5 * (v + 0.5 * d * d)
        assert(rows(i + 2)._4 == m, s"event ${i + 2} ewma replay")
      }
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState weighted reservoir: deterministic A-Res top-k across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = startQuery(Streaming.weightedReservoir(in.toDS(), k = 3)
        .toDF("event_type", "event_id", "ares_key"), "wres")
      val b1 = Seq(Ev(1, 1, "m", 10.0, ts(0)), Ev(2, 1, "m", 500.0, ts(1)),
        Ev(3, 1, "m", 2.0, ts(2)), Ev(4, 1, "m", 80.0, ts(3)))
      val b2 = Seq(Ev(5, 1, "m", 900.0, ts(4)), Ev(6, 1, "m", 1.0, ts(5)))
      def naive(evs: Seq[Ev]): Seq[(String, Long, Double)] = evs
        .map(e => (e.event_type, e.event_id, Streaming.aresKey(e.event_id, math.max(e.value, 1e-9))))
        .sortBy { case (_, id, k0) => (-k0, id) }.take(3)
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      // batch 3: at-least-once re-delivery — one id currently IN the
      // reservoir (5) and one long evicted (3); the reservoir must be
      // identical to exactly-once delivery (A-Res keys are pure
      // functions of (id, w), and duplicates are dropped on insert)
      in.addData(Ev(5, 1, "m", 900.0, ts(6)), Ev(3, 1, "m", 2.0, ts(7)))
      q.processAllAvailable()
      // update-mode memory sink accumulates each batch's emission: the
      // table is reservoir(b1) ++ reservoir(b1 ++ b2) ++ the UNCHANGED
      // reservoir after the duplicate-only batch
      val got = spark.table("wres").as[(String, Long, Double)].collect().toSeq
        .sortBy(t => (t._2, t._3))
      val expect = (naive(b1) ++ naive(b1 ++ b2) ++ naive(b1 ++ b2))
        .sortBy(t => (t._2, t._3))
      assert(got == expect,
        "reservoir must be the exact deterministic A-Res top-k after each batch, " +
          "unchanged by re-delivered ids")
      // the final reservoir must be reachable from the persisted state,
      // i.e. a batch-2-heavy item must EVICT a batch-1 survivor
      val finalIds = naive(b1 ++ b2).map(_._2).toSet
      assert(finalIds != naive(b1).map(_._2).toSet,
        "fixture must exercise cross-batch eviction")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState timers: idle keys flush when the watermark passes last-event + gap") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = startQuery(Streaming.idleFlush(in.toDS(), idleMs = 10 * 60 * 1000)
        .toDF("user_id", "n_events"), "idleflush")
      // user 1 active at 00:01..00:03; user 2 at 00:05 — nothing idle yet
      in.addData(Ev(1, 1, "click", 1, ts(1)), Ev(2, 1, "click", 1, ts(3)), Ev(3, 2, "view", 1, ts(5)))
      q.processAllAvailable()
      assert(spark.table("idleflush").count() == 0)
      // user 2 reappears at 00:30 → watermark 00:30 passes user 1's
      // timer (00:03 + 10min = 00:13): user 1 flushes with n=2.
      // User 2's own timer re-armed to 00:40 — still live.
      in.addData(Ev(4, 2, "view", 1, ts(30)))
      q.processAllAvailable()
      // timer fires on the NEXT batch boundary after the watermark moves
      in.addData(Ev(5, 3, "view", 1, ts(31)))
      q.processAllAvailable()
      val rows = spark.table("idleflush").as[(Long, Long)].collect().toSet
      assert(rows.contains((1L, 2L)), s"got $rows")
      assert(!rows.exists(_._1 == 2L), s"user 2 must still be live: $rows")
      // after the flush the counter resets: user 1 returns, goes idle again → n=1
      in.addData(Ev(6, 1, "click", 1, ts(40)))
      q.processAllAvailable()
      in.addData(Ev(7, 3, "view", 1, ts(60)))
      q.processAllAvailable()
      in.addData(Ev(8, 3, "view", 1, ts(61)))
      q.processAllAvailable()
      val rows2 = spark.table("idleflush").as[(Long, Long)].collect().toList
      assert(rows2.count(r => r == ((1L, 1L))) == 1, s"got $rows2")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("idle-flush timers: an admissible LATE event must not pull the deadline earlier") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      // 10-minute watermark delay: events up to 10 min behind max ts are
      // admissible. The idle deadline must stay lastEvent+gap where
      // lastEvent is the max EVER seen — a late event folded into state
      // must not re-arm the timer to lateTs+gap (the round-4 bug shape).
      val q = startQuery(Streaming.idleFlush(in.toDS(), idleMs = 30 * 60 * 1000,
        watermarkDelay = "10 minutes").toDF("user_id", "n_events"), "idleflush_late")
      in.addData(Ev(1, 1, "click", 1, ts(20)))   // u1@00:20 → wm 00:10, timer 00:50
      q.processAllAvailable()
      in.addData(Ev(2, 1, "click", 1, ts(12)))   // LATE for u1 (admissible: 00:12 ≥ wm)
      q.processAllAvailable()                     // buggy re-arm would set timer 00:42
      in.addData(Ev(3, 2, "view", 1, ts(55)))    // wm → 00:45 > 00:42, < 00:50
      q.processAllAvailable()
      in.addData(Ev(4, 3, "view", 1, ts(56)))    // batch boundary: expired timers fire
      q.processAllAvailable()
      val premature = spark.table("idleflush_late").as[(Long, Long)].collect().toSet
      assert(!premature.exists(_._1 == 1L),
        s"u1 flushed before lastEvent+gap (late event pulled the timer): $premature")
      in.addData(Ev(5, 2, "view", 1, ts(70)))    // wm → 01:00 > 00:50
      q.processAllAvailable()
      in.addData(Ev(6, 3, "view", 1, ts(71)))    // fire
      q.processAllAvailable()
      val rows = spark.table("idleflush_late").as[(Long, Long)].collect().toSet
      assert(rows.contains((1L, 2L)), s"u1 must flush with BOTH events counted: $rows")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState ListState: last-N event ring trims at the bound and survives batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = startQuery(Streaming.lastN(in.toDS(), n = 3)
        .toDF("user_id", "last_event_ids"), "lastn")
      // batch 1: two events for u1, one for u2 (fed out of ts order —
      // the ring must store event-time order)
      in.addData(Ev(12, 1, "view", 1, ts(2)), Ev(11, 1, "click", 1, ts(1)),
        Ev(21, 2, "click", 1, ts(1)))
      q.processAllAvailable()
      // batch 2: two more for u1 → ring overflows 3, oldest (11) drops
      in.addData(Ev(13, 1, "click", 1, ts(3)), Ev(14, 1, "view", 1, ts(4)))
      q.processAllAvailable()
      val rows = spark.table("lastn").as[(Long, Seq[Long])].collect()
      val u1 = rows.filter(_._1 == 1L).map(_._2)
      assert(u1.contains(Seq(11L, 12L)), s"batch-1 ring must be event-time ordered: ${u1.toSeq}")
      assert(u1.contains(Seq(12L, 13L, 14L)),
        s"batch-2 ring must resume from state, trim to N=3, drop the oldest: ${u1.toSeq}")
      assert(rows.filter(_._1 == 2L).map(_._2).contains(Seq(21L)))
      assert(u1.forall(_.length <= 3), "ring must never exceed the bound")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming CDC sink: I/U/D changelog folds into the snapshot exactly once") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_cdc_snap").toString + "/t"
    Sinks.Snapshots.commit(s,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "value"), path)

    val in = MemoryStream[(Long, String, Double, Long)]
    val q = in.toDF().toDF("key", "op", "value", "seq").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Sinks.Snapshots.applyChangelogBatch(batch.sparkSession, path, batch,
          Seq("key"), "op", Seq("seq"), id)
        ()
      }.start()
    queries = q :: queries
    // batch 0: update 1, delete 2, insert 4; within-batch LWW on key 5
    in.addData((1L, "U", 11.0, 1L), (2L, "D", 0.0, 2L), (4L, "I", 40.0, 3L),
      (5L, "I", 50.0, 4L), (5L, "U", 55.0, 5L))
    q.processAllAvailable()
    // batch 1: re-insert the deleted key 2, delete 3
    in.addData((2L, "I", 22.0, 6L), (3L, "D", 0.0, 7L))
    q.processAllAvailable()
    q.stop()

    val got = Sinks.Snapshots.read(s, path).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 11.0, 2L -> 22.0, 4L -> 40.0, 5L -> 55.0),
      s"streamed CDC fold diverged: $got")
    // exactly-once: replaying an already-committed batch id is a no-op
    val versionsBefore = Sinks.Snapshots.versions(s, path).size
    val replay = Seq((9L, "I", 99.0, 8L)).toDF("key", "op", "value", "seq")
    assert(Sinks.Snapshots.applyChangelogBatch(s, path, replay,
      Seq("key"), "op", Seq("seq"), 0L).isEmpty, "replayed batchId must no-op")
    assert(Sinks.Snapshots.versions(s, path).size == versionsBefore)
    assert(!Sinks.Snapshots.read(s, path).as[(Long, Double)].collect()
      .toMap.contains(9L))
  }

  test("ValueState TTL: expired running totals restart; TTLConfig.NONE accumulates forever") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // ProcessingTime time mode constructs micro-batches CONTINUOUSLY
      // (TTL/timer semantics need batches without new data), so
      // processAllAvailable never settles — poll the sink instead.
      def awaitRows(name: String, want: Int, timeoutMs: Long = 60000): Seq[(Long, Long, Double)] = {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        var rows = Seq.empty[(Long, Long, Double)]
        while (rows.length < want && System.nanoTime() < deadline) {
          Thread.sleep(200)
          rows = spark.table(name).as[(Long, Long, Double)].collect().toSeq
        }
        assert(rows.length >= want, s"$name: expected $want emissions, got $rows")
        rows
      }
      def run(ttl: org.apache.spark.sql.streaming.TTLConfig, name: String): Seq[(Long, Long, Double)] = {
        val in = MemoryStream[Ev]
        val q = in.toDS().groupByKey(_.user_id)
          .transformWithState(new Streaming.RunningTotalsProcessor(ttl),
            org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "n", "sum")
          .writeStream.format("memory").queryName(name).outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
          .start()
        queries = q :: queries
        in.addData(Ev(1, 1, "click", 10.0, ts(1)))
        awaitRows(name, 1)
        Thread.sleep(2500) // >> the 1 s TTL — expiry is the SAFE direction
        in.addData(Ev(2, 1, "click", 5.0, ts(2)))
        val rows = awaitRows(name, 2)
        q.stop() // continuous empty batches otherwise — stop before the next run
        rows
      }
      val expired = run(org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofSeconds(1)), "ttl_expired")
      // batch-2 emission restarts from zero: (1, 5.0), not (2, 15.0)
      assert(expired.contains((1L, 1L, 5.0)) && !expired.contains((1L, 2L, 15.0)),
        s"TTL'd state must expire across the sleep: $expired")
      val forever = run(org.apache.spark.sql.streaming.TTLConfig.NONE, "ttl_none")
      assert(forever.contains((1L, 2L, 15.0)),
        s"TTLConfig.NONE state must survive the same sleep: $forever")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ListState ring end-state equals the batch lastNPerKey on the same events") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Seq(
        Ev(11, 1, "click", 1, ts(1)), Ev(12, 1, "view", 1, ts(2)),
        Ev(21, 2, "click", 1, ts(1)), Ev(13, 1, "click", 1, ts(3)),
        Ev(14, 1, "view", 1, ts(4)), Ev(22, 2, "view", 1, ts(5)),
        Ev(15, 1, "click", 1, ts(5)))
      val in = MemoryStream[Ev]
      val q = startQuery(Streaming.lastN(in.toDS(), n = 3)
        .toDF("user_id", "last_event_ids"), "lastn_parity")
      in.addData(evs.take(4)); q.processAllAvailable()
      in.addData(evs.drop(4)); q.processAllAvailable()
      // last emission per key IS the converged ring (Update mode
      // re-emits every touched key each batch)
      val streamed = spark.table("lastn_parity").as[(Long, Seq[Long])]
        .collect().zipWithIndex
        .groupBy(_._1._1).map { case (k, rows) => k -> rows.maxBy(_._2)._1._2 }
      val batch = Relational.lastNPerKey(
        evs.toDF().withColumn(
          "ts_ns",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")) * 1000L), 3)
        .as[(Long, Seq[Long])].collect().toMap
      assert(streamed == batch,
        s"streaming ring $streamed must equal batch lastNPerKey $batch")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState: per-(user,type) counts accumulate across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = startQuery(Streaming.typeCounts(in.toDS())
        .toDF("user_id", "event_type", "n"), "typecounts")
      in.addData(Ev(1, 1, "click", 1, ts(1)), Ev(2, 1, "click", 1, ts(2)), Ev(3, 1, "view", 1, ts(3)))
      q.processAllAvailable()
      in.addData(Ev(4, 1, "click", 1, ts(4)), Ev(5, 2, "view", 1, ts(5)))
      q.processAllAvailable()
      val rows = spark.table("typecounts").as[(Long, String, Long)].collect().toSet
      // batch 1 emissions + batch 2 updates carrying MapState forward
      assert(rows.contains((1L, "click", 2L)) && rows.contains((1L, "view", 1L)))
      assert(rows.contains((1L, "click", 3L)), s"click count must resume from state: $rows")
      assert(rows.contains((2L, "view", 1L)))
      // batch 2 touched only user 1's click entry — no re-emission of view
      assert(rows.count(r => r._1 == 1L && r._2 == "view") == 1)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("foreachBatch sink: every micro-batch delivered exactly once with its batchId") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]() // batchId -> rows
    val q = in.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // the idempotent-sink contract: (batchId, deterministic content);
        // a real deployment keys its transactional write on batchId
        seen.put(id, batch.count())
        ()
      }
      .start()
    queries = q :: queries
    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 2.0, ts(2)))
    q.processAllAvailable()
    in.addData(Ev(3, 2, "view", 3.0, ts(3)))
    q.processAllAvailable()
    assert(seen.size() == 2, s"expected 2 micro-batches, saw ${seen}")
    assert(seen.values().stream().mapToLong(identity(_)).sum() == 3)
  }

  test("foreachBatch -> snapshot table: batchId commits are exactly-once; replays skip; readLog unions the log") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_snapstream_").toString + "/t"
    val in = MemoryStream[Ev]
    val q = in.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Sinks.Snapshots.commitBatch(batch.sparkSession, batch.toDF(), path, id)
        ()
      }
      .start()
    queries = q :: queries
    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 2.0, ts(2)))
    q.processAllAvailable()
    in.addData(Ev(3, 2, "view", 3.0, ts(3)))
    q.processAllAvailable()
    val vs = Sinks.Snapshots.versions(spark, path)
    assert(vs.size == 2, s"two micro-batches -> two snapshot commits, got $vs")
    // failure-recovery replay: re-deliver batch 0 — the tip's batch_id
    // makes it an idempotent no-op
    val replay = Seq(Ev(1, 1, "click", 1.0, ts(1))).toDF()
    assert(Sinks.Snapshots.commitBatch(spark, replay, path, batchId = 0L).isEmpty,
      "a replayed batchId must not commit a new version")
    assert(Sinks.Snapshots.versions(spark, path) == vs)
    // a genuinely new batch id commits
    assert(Sinks.Snapshots.commitBatch(spark,
      Seq(Ev(4, 3, "view", 4.0, ts(4))).toDF(), path, batchId = 2L).nonEmpty)
    // a PLAIN snapshot commit interleaves (e.g. a compaction rewrite or
    // upsert) — it carries no batch_id, and it must NOT mask the replay
    // guard: latestBatchId scans backward past it
    Sinks.Snapshots.commit(spark, Seq(Ev(9, 9, "plain", 9.0, ts(9))).toDF(), path)
    assert(Sinks.Snapshots.latestBatchId(spark, path).contains(2L),
      "latestBatchId must see through interleaved non-streaming commits")
    assert(Sinks.Snapshots.commitBatch(spark, replay, path, batchId = 2L).isEmpty,
      "a replay after an interleaved plain commit must still be an idempotent no-op")
    // the append-log view is the exactly-once union (the plain commit is
    // part of the log — it committed once, it appears once)
    val ids = Sinks.Snapshots.readLog(spark, path)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L, 9L),
      s"readLog must union each commit exactly once, got ${ids.toSeq}")
  }

  test("streaming top-k per window: update-mode counts merge into a store the finisher re-ranks") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // serving store keyed by (window, type): update-mode rows OVERWRITE —
    // ranking must happen over this merged view, never the raw batch
    // (a batch only carries the types whose counts changed)
    val counts = new java.util.concurrent.ConcurrentHashMap[(Long, String), Long]()
    val q = Streaming.tumblingCounts(in.toDF(), "10 minutes", "10 minutes")
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach { r =>
          counts.put((r.getTimestamp(0).getTime, r.getString(1)), r.getLong(2))
        }
        ()
      }
      .start()
    queries = q :: queries
    def leaderboard(): Map[(Long, Int), (String, Long)] = {
      import scala.jdk.CollectionConverters._
      val df = counts.asScala.toSeq
        .map { case ((w, t), n) => (new Timestamp(w), t, n) }
        .toDF("window_start", "event_type", "n")
      Streaming.topKPerWindow(df, k = 2).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getInt(3)) -> ((r.getString(1), r.getLong(2))))
        .toMap
    }
    // window [00:00,00:10): click×3, view×2, error×1
    in.addData(
      Ev(1, 1, "click", 1, ts(1)), Ev(2, 1, "click", 1, ts(2)), Ev(3, 1, "view", 1, ts(3)),
      Ev(4, 2, "view", 1, ts(4)), Ev(5, 2, "error", 1, ts(5)), Ev(6, 2, "click", 1, ts(6)))
    q.processAllAvailable()
    val w0 = ts(0).getTime
    val lb1 = leaderboard()
    assert(lb1((w0, 1)) == ("click", 3L), s"lb=$lb1")
    assert(lb1((w0, 2)) == ("view", 2L))
    // a later batch flips the leader: view gains 2 more → view×4 > click×3.
    // The flip is only visible because the rank runs over the MERGED store;
    // this batch's update rows alone contain no 'click' row at all.
    in.addData(Ev(7, 3, "view", 1, ts(7)), Ev(8, 3, "view", 1, ts(8)))
    q.processAllAvailable()
    val lb2 = leaderboard()
    assert(lb2((w0, 1)) == ("view", 4L), s"lb=$lb2")
    assert(lb2((w0, 2)) == ("click", 3L))
  }

  test("update output mode re-emits a window's row each time it changes") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = Streaming.tumblingCounts(in.toDF(), "10 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("upd").outputMode("update").start()
    queries = q :: queries
    in.addData(Ev(1, 1, "click", 1.0, ts(1)))
    q.processAllAvailable()
    in.addData(Ev(2, 1, "click", 2.0, ts(5)))
    q.processAllAvailable()
    // update mode: the [00:00,00:10) click window was emitted twice —
    // once per micro-batch that changed it (count 1, then count 2)
    val emitted = spark.table("upd").as[(Timestamp, String, Long, Double)].collect()
      .filter(_._2 == "click").map(_._3).sorted.toSeq
    assert(emitted == Seq(1L, 2L), s"expected re-emission [1, 2], got $emitted")
  }

  test("DPP pipeline orchestrates a STREAMING DataFrame end-to-end") {
    import graft.pipeline._
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // pipeline slots hold lazy DataFrames — a streaming source threads
    // through the same combinators as batch; the sink starts outside
    val p = DPP("events" -> in.toDF())
    p.sequence(
      p.events >> fn("clicksOnly")(_.filter(col("event_type") === "click")) >> p.clicks,
      Prev >> fn("windowed")(df =>
        Streaming.tumblingCounts(df, "10 minutes", "10 minutes")) >> p.out)
    val out = p("out")
    assert(out.isStreaming, "pipeline must preserve streaming-ness")
    val q = out.writeStream.format("memory").queryName("dsl_stream").outputMode("append").start()
    queries = q :: queries
    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "view", 9.0, ts(2)),
      Ev(3, 1, "click", 2.0, ts(5)))
    q.processAllAvailable()
    in.addData(Ev(4, 2, "click", 8.0, ts(31))) // advance watermark, close window 1
    q.processAllAvailable()
    val rows = spark.table("dsl_stream").as[(Timestamp, String, Long, Double)].collect()
    assert(rows.toSeq == Seq((ts(0), "click", 2L, 3.0)),
      s"view events must be filtered before windowing: ${rows.toSeq}")
  }

  test("batch and streaming tumbling windows agree on on-time data") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 2.0, ts(9)),
      Ev(3, 2, "view", 4.0, ts(11))).toDF()
    val out = Streaming.tumblingCounts(batch, "10 minutes", "10 minutes")
      .as[(Timestamp, String, Long, Double)].collect().sortBy(r => (r._1.getTime, r._2)).toSeq
    assert(out == Seq((ts(0), "click", 2L, 3.0), (ts(10), "view", 1L, 4.0)))
  }

  test("checkpoint recovery: a restarted query resumes aggregation state, not from zero") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Ev]
    def start() = {
      val agg = in.toDF().groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
      val q = agg.writeStream.format("memory").queryName("ckpt_counts")
        .outputMode("complete").option("checkpointLocation", ckpt).start()
      queries = q :: queries
      q
    }
    val q1 = start()
    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 2.0, ts(2)))
    q1.processAllAvailable()
    assert(spark.table("ckpt_counts").filter(col("user_id") === 1)
      .head.getLong(1) == 2)
    q1.stop() // simulated failure/redeploy
    // new incarnation, same checkpoint: state must carry over
    val q2 = start()
    in.addData(Ev(3, 1, "click", 4.0, ts(3)))
    q2.processAllAvailable()
    val r = spark.table("ckpt_counts").filter(col("user_id") === 1).head
    assert(r.getLong(1) == 3 && r.getDouble(2) == 7.0,
      s"state lost across restart: $r")
    q2.stop()
  }

  test("restart under load: transformWithState MapState survives an ungraceful stop, resumes identical to an uninterrupted run (RocksDB)") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the 100-TB-ingest scenario the clean-restart case does NOT cover:
      // the query dies, data keeps landing in the source during the
      // outage, and the restarted incarnation must resume from the
      // RocksDB snapshot — not reprocess from zero, not lose the outage
      // backlog
      // the memory sink cannot recover from a checkpoint (append mode);
      // a foreachBatch sink — the real deployment shape — can, and its
      // driver-side collector lets each incarnation's emissions be
      // asserted separately
      val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
      val in = MemoryStream[Ev]
      def start(sink: scala.collection.mutable.Set[(Long, String, Long)]) = {
        val q = Streaming.typeCounts(in.toDS())
          .toDF("user_id", "event_type", "n")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val rows = batch.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
            sink.synchronized { sink ++= rows }
            ()
          }
          .option("checkpointLocation", ckpt).start()
        queries = q :: queries
        q
      }
      val batch1 = Seq(Ev(1, 1, "click", 1, ts(1)), Ev(2, 1, "click", 1, ts(2)),
        Ev(3, 1, "view", 1, ts(3)), Ev(4, 2, "view", 1, ts(4)))
      val batch2 = Seq(Ev(5, 1, "click", 1, ts(5)), Ev(6, 2, "view", 1, ts(6)))
      val out1 = scala.collection.mutable.Set.empty[(Long, String, Long)]
      val out2 = scala.collection.mutable.Set.empty[(Long, String, Long)]
      val q1 = start(out1)
      in.addData(batch1: _*)
      q1.processAllAvailable()
      q1.stop() // die with state mid-accumulation
      in.addData(batch2: _*) // backlog lands while the query is down
      val q2 = start(out2)
      q2.processAllAvailable()
      // the second incarnation processed ONLY the backlog batch, but its
      // emissions continue from the recovered MapState counts
      assert(out2.toSet == Set((1L, "click", 3L), (2L, "view", 2L)),
        s"MapState lost or backlog dropped across restart: $out2")
      // identical to an uninterrupted twin over the same batches
      val twin = MemoryStream[Ev]
      val tq = startQuery(Streaming.typeCounts(twin.toDS())
        .toDF("user_id", "event_type", "n"), "tws_twin")
      twin.addData(batch1: _*); tq.processAllAvailable()
      twin.addData(batch2: _*); tq.processAllAvailable()
      def finals(rows: Iterable[(Long, String, Long)]) = rows
        .groupBy(r => (r._1, r._2)).map { case (k, v) => (k._1, k._2, v.map(_._3).max) }.toSet
      val twinFinal = finals(spark.table("tws_twin").as[(Long, String, Long)].collect())
      val restartFinal = finals(out1.toSeq ++ out2.toSeq)
      assert(restartFinal == twinFinal,
        s"restarted run diverges from uninterrupted twin: $restartFinal vs $twinFinal")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("restart under load: event-time timers re-arm from the checkpoint and fire after restart (RocksDB)") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_timer_ckpt").toString
      val in = MemoryStream[Ev]
      def start(sink: scala.collection.mutable.Set[(Long, Long)]) = {
        val q = Streaming.idleFlush(in.toDS(), idleMs = 10 * 60 * 1000)
          .toDF("user_id", "n_events")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val rows = batch.collect().map(r => (r.getLong(0), r.getLong(1)))
            sink.synchronized { sink ++= rows }
            ()
          }
          .option("checkpointLocation", ckpt).start()
        queries = q :: queries
        q
      }
      val out1 = scala.collection.mutable.Set.empty[(Long, Long)]
      val out2 = scala.collection.mutable.Set.empty[(Long, Long)]
      val q1 = start(out1)
      // user 1 active at 00:01..00:03 → timer armed for 00:13; user 2 at 00:05
      in.addData(Ev(1, 1, "click", 1, ts(1)), Ev(2, 1, "click", 1, ts(3)), Ev(3, 2, "view", 1, ts(5)))
      q1.processAllAvailable()
      assert(out1.isEmpty, "nothing idle before the stop")
      q1.stop() // die with user 1's timer armed but unfired
      // outage backlog: user 2 reappears at 00:30 → on restart the
      // watermark passes user 1's recovered 00:13 timer
      in.addData(Ev(4, 2, "view", 1, ts(30)))
      val q2 = start(out2)
      q2.processAllAvailable()
      // timers fire at the batch boundary AFTER the watermark moves
      in.addData(Ev(5, 3, "view", 1, ts(31)))
      q2.processAllAvailable()
      val rows = out2.toSet
      // n=2 proves BOTH the timer and the ValueState counter behind it
      // crossed the restart — the same numbers the uninterrupted
      // variant of this scenario asserts above
      assert(rows.contains((1L, 2L)), s"recovered timer failed to fire: $rows")
      assert(!rows.exists(_._1 == 2L), s"user 2 must still be live: $rows")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream LEFT OUTER join emits unmatched rows once the watermark passes") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val c = clicks.toDF().select(col("event_id").as("cid"), col("user_id").as("cu"),
      col("ts").as("cts")).withWatermark("cts", "0 seconds")
    val b = buys.toDF().select(col("event_id").as("bid"), col("user_id").as("bu"),
      col("ts").as("bts")).withWatermark("bts", "0 seconds")
    val j = c.join(b,
      col("cu") === col("bu") &&
        col("bts").between(col("cts"), col("cts") + expr("INTERVAL 10 MINUTES")),
      "left_outer")
    val q = startQuery(j.select("cid", "bid"), "louter")
    // user 1 clicks then buys inside the window; user 2 clicks, never buys
    clicks.addData(Ev(1, 1, "click", 1.0, ts(0)), Ev(2, 2, "click", 1.0, ts(0)))
    buys.addData(Ev(10, 1, "purchase", 5.0, ts(5)))
    q.processAllAvailable()
    // advance BOTH watermarks far past the join window so the unmatched
    // left row can be finalized as (2, null)
    clicks.addData(Ev(3, 9, "click", 1.0, ts(60)))
    buys.addData(Ev(11, 9, "purchase", 1.0, ts(60)))
    q.processAllAvailable()
    q.processAllAvailable() // outer results flush one trigger later
    val rows = spark.table("louter").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows.contains((1L, 10L)), s"matched pair missing: $rows")
    assert(rows.contains((2L, -1L)), s"unmatched left row never emitted: $rows")
  }

  test("file source admission control: maxFilesPerTrigger bounds every micro-batch") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_mfpt").toString
    // 4 input files → with maxFilesPerTrigger=1, AvailableNow must
    // process them as (at least) 4 bounded batches, not one big one
    Tables.orders(spark, "/root/testdata/sf0.001")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val total = spark.read.parquet(dir).count()
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += df.count() }; ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(batchSizes.sum == total, s"all rows delivered: $batchSizes vs $total")
    assert(batchSizes.count(_ > 0) >= 4, s"expected >=4 bounded batches, got $batchSizes")
    assert(batchSizes.forall(_ < total), s"no batch may swallow the whole input: $batchSizes")
  }

  test("rate-micro-batch source: deterministic generator feeds a streaming transform") {
    import org.apache.spark.sql.functions._
    // rate-micro-batch emits exactly rowsPerBatch consecutive values per
    // micro-batch with a fixed start timestamp — the deterministic
    // load-generator (unlike `rate`, which is wall-clock-coupled)
    val src = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 10)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 1000)
      .load()
      .withColumn("bucket", col("value") % 2)
    val q = startQuery(src, "ratesrc")
    // wait until at least 3 micro-batches (30 rows) have been delivered
    val deadline = System.currentTimeMillis() + 30000
    while (spark.table("ratesrc").count() < 30 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q.stop()
    val n = spark.table("ratesrc").count()
    assert(n >= 30, s"expected >=30 generated rows, got $n")
    // values are the consecutive prefix 0..n-1 — no gaps, no dups
    val vals = spark.table("ratesrc").select("value").collect().map(_.getLong(0)).sorted
    assert(vals.head == 0L && vals.last == n - 1 && vals.distinct.length == n.toInt)
    assert(spark.table("ratesrc").filter(col("bucket") =!= col("value") % 2).count() == 0)
  }

  test("stream-static join: micro-batches enrich against a broadcast dimension table") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    implicit val ctx = spark.sqlContext
    // static side: per-user segment dimension (re-read per micro-batch in
    // streaming; broadcast-joined, so the stream side never shuffles)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val in = MemoryStream[Ev]
    val joined = in.toDF().join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), coalesce(col("segment"), lit("none")).as("segment"))
    val q = startQuery(joined, "enriched")
    in.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 3, "view", 2.0, ts(2)))
    q.processAllAvailable()
    in.addData(Ev(3, 2, "click", 3.0, ts(3)))
    q.processAllAvailable()
    val rows = spark.table("enriched").as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 1L, "gold"), (2L, 3L, "none"), (3L, 2L, "silver")))
  }
}
