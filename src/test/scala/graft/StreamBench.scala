package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Ev, Streaming}

/** Streaming throughput bench (round-10 verdict item 6): drives each
  * stateful operator with the deterministic `rate-micro-batch` source —
  * fixed rows per micro-batch, fixed batch count — and reports rows/s
  * plus the state-store footprint from the query's own progress metrics
  * (numRowsTotal / memory bytes per stateful operator). RocksDB state
  * store, the production configuration the specs pin.
  *
  * `sbt "Test/runMain graft.StreamBench <out.json> [rowsPerBatch] [numBatches]"`
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "BENCH_STREAM_r12.json"
    val rowsPerBatch = if (args.length > 1) args(1).toLong else 200000L
    val numBatches = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    /** rate-micro-batch value → Ev: 100k distinct users, 8 event types,
      * event-time advancing 1s per batch (watermark/timer operators see
      * real progress).
      */
    def source(): Dataset[Ev] = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", 8)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 1000L)
      .load()
      .select(
        col("value").as("event_id"),
        (col("value") % 100000).as("user_id"),
        concat(lit("t"), (col("value") % 8)).as("event_type"),
        (col("value") % 997).cast("double").as("value"),
        col("timestamp").as("ts"))
      .as[Ev]

    def bench(name: String, df: DataFrame,
              mode: String = "update"): String = {
      val t0 = System.nanoTime()
      val q = df.writeStream
        .format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"sb_$name").toString)
        .outputMode(mode)
        .start()
      var done = false
      while (!done) {
        Thread.sleep(200)
        if (q.recentProgress.count(_.numInputRows > 0) >= numBatches) done = true
      }
      val prog = q.recentProgress.filter(_.numInputRows > 0).take(numBatches)
      q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = prog.map(_.numInputRows).sum
      val rps = rows / secs
      val lastState = prog.lastOption.flatMap(p => Option(p.stateOperators))
        .filter(_.nonEmpty)
      val stateRows = lastState.map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      val stateBytes = lastState.map(_.map(_.memoryUsedBytes).sum).getOrElse(0L)
      println(f"[streambench] $name%-22s $rows%9d rows in $secs%7.1fs = $rps%9.0f rows/s  state: $stateRows rows / $stateBytes B")
      f""" {"op": "$name", "rows": $rows, "seconds": $secs%.2f, "rows_per_sec": $rps%.0f, "state_rows": $stateRows, "state_bytes": $stateBytes}"""
    }

    val results = Seq(
      bench("ewma_anomalies",
        Streaming.ewmaAnomalies(source())
          .toDF("user_id", "event_id", "value", "ewma", "anomaly")),
      bench("weighted_reservoir",
        Streaming.weightedReservoir(source(), k = 3)
          .toDF("event_type", "event_id", "ares_key")),
      bench("type_counts",
        Streaming.typeCounts(source()).toDF("user_id", "event_type", "n")),
      bench("running_totals",
        Streaming.runningTotals(source()).toDF("user_id", "n_events", "value_sum")),
      bench("idle_flush",
        Streaming.idleFlush(source(), idleMs = 2000, watermarkDelay = "0 seconds")
          .toDF("user_id", "n_events"), mode = "append"),
      bench("tumbling_median",
        Streaming.tumblingMedian(source().toDF(), "10 seconds", "10 seconds")),
      bench("sessionize_fmgws",
        Streaming.sessionize(source().withWatermark("ts", "0 seconds"), gapMs = 5000)
          .toDF("user_id", "session_start", "session_end", "n_events", "value_sum"),
        mode = "append"),
      bench("dedup_watermark",
        Streaming.dedupWithinWatermark(source().toDF(), "10 seconds"),
        mode = "append"),
      bench("last_n_ring",
        Streaming.lastN(source(), n = 5).toDF("user_id", "last_event_ids")),
      // the exactly-once lakehouse leg: every micro-batch lands as one
      // idempotent snapshot-table version (foreachBatch + commitBatch —
      // replayed batch ids are no-ops), so the number includes the full
      // commit protocol: parquet write, manifest rename, read-back verify
      {
        val snapPath = java.nio.file.Files
          .createTempDirectory("sb_snap").toString + "/t"
        val name = "snapshot_commit_batch"
        val t0 = System.nanoTime()
        // AtomicInteger, not a plain var: foreachBatch mutates from the
        // micro-batch thread and the main thread polls — a non-volatile
        // var has no JMM visibility guarantee and the poll could hang.
        val batches = new java.util.concurrent.atomic.AtomicInteger(0)
        val q = source().toDF().writeStream
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(s"sb_$name").toString)
          .foreachBatch { (batch: DataFrame, id: Long) =>
            graft.ops.Sinks.Snapshots.commitBatch(batch.sparkSession, batch, snapPath, id)
            batches.incrementAndGet()
            ()
          }
          .start()
        while (batches.get() < numBatches) Thread.sleep(200)
        q.stop()
        val secs = (System.nanoTime() - t0) / 1e9
        val rows = graft.ops.Sinks.Snapshots.readLog(spark, snapPath).count()
        val versions = graft.ops.Sinks.Snapshots.versions(spark, snapPath).size
        val rps = rows / secs
        println(f"[streambench] $name%-22s $rows%9d rows in $secs%7.1fs = $rps%9.0f rows/s  state: $versions committed versions")
        f""" {"op": "$name", "rows": $rows, "seconds": $secs%.2f, "rows_per_sec": $rps%.0f, "state_rows": $versions, "state_bytes": 0}"""
      })

    val json =
      s"""{
 "what": "transformWithState operator family throughput on the rate-micro-batch source (RocksDB state store, local[8], ${rowsPerBatch} rows/batch x ${numBatches} measured batches, 100k users / 8 event types)",
 "note": "rows_per_sec includes micro-batch scheduling overhead (the honest per-operator number a capacity plan needs); state metrics from the final batch's progress.stateOperators",
 "results": [
${results.mkString(",\n")}
 ]}
"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[streambench] wrote $out")
    spark.stop()
  }
}
