"""Python-authored STREAMING drift monitor through the facade.

The product story in one script: the reference's audience (Python)
authors a Structured Streaming pipeline with the graft_dpp combinators,
the engine runs it, and the result is pinned to the ORACLED batch gate
`q_stream_drift` — streaming windowed counts must equal the batch
window() counts on the same data, and the PSI scoring (identical
expressions) must reproduce the gate's rows exactly.

Shape: events are staged as two parquet chunks and streamed with
``maxFilesPerTrigger=1`` (≥2 micro-batches, so cross-batch aggregation
state is actually exercised); the pipeline is a graft_dpp ``sequence``
over the STREAMING DataFrame (the combinators preserve streaming-ness —
slots hold lazy frames, streaming or not); the baseline event-type mix
is a static frame joined in after the windowed aggregation, exactly the
production "broadcast reference snapshot" shape the Scala gate's
scaladoc describes.

Run from a stock pyspark (graft classes on the driver classpath)::

    cd /root/repo/python && python3 stream_drift_demo.py [sfDir]
"""
import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

import graft_py as g
from graft_dpp import DPP, PREV, fn

REPO_CLASSES = "/root/repo/target/scala-2.13/classes"


def normalize_ts(df):
    # mirror graft.ops.Tables.events: nanosAsLong vintage → timestamp
    if dict(df.dtypes)["ts"] == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def window_counts(df):
    return (df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").cast("long").alias("window_start_epoch"),
                      "event_type", "n"))


def psi_score(win, base, tot):
    """The gate's PSI scoring, verbatim in pyspark expressions."""
    win_tot = win.groupBy("window_start_epoch").agg(F.sum("n").alias("n_win"))
    return (win_tot.crossJoin(F.broadcast(base))
            .join(win, ["window_start_epoch", "event_type"], "left")
            .na.fill(0, ["n"])
            .crossJoin(F.broadcast(tot))
            .withColumn("p_win", (F.col("n") + 0.5)
                        / (F.col("n_win") + F.lit(0.5) * F.col("k_types")))
            .withColumn("p_base", (F.col("n_base") + 0.5)
                        / (F.col("n_tot") + F.lit(0.5) * F.col("k_types")))
            .withColumn("psi_term",
                        F.round((F.col("p_win") - F.col("p_base"))
                                * F.log(F.col("p_win") / F.col("p_base"))
                                + F.lit(1e-9), 6).cast(DecimalType(18, 6)))
            .groupBy("window_start_epoch")
            .agg(F.sum("n").alias("n_events"),
                 F.sum("psi_term").cast("double").alias("psi"))
            .orderBy("window_start_epoch"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = g.session(
        cpus=4,
        extra_conf={"spark.driver.extraClassPath": REPO_CLASSES})

    events = normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))

    # stage the corpus as two chunks so the stream runs ≥2 micro-batches
    # (data files only — Spark's file source must not see _SUCCESS/.crc)
    stage = tempfile.mkdtemp(prefix="graft_stream_drift_")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{stage}/c0")
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{stage}/c1")
    in_dir = f"{stage}/in"
    os.makedirs(in_dir)
    for chunk in ("c0", "c1"):
        for name in glob.glob(f"{stage}/{chunk}/*.parquet"):
            shutil.copy(name, f"{in_dir}/{chunk}_{os.path.basename(name)}")

    stream = (spark.readStream
              .schema(events.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(in_dir))

    # Python-authored pipeline over the STREAMING frame
    p = DPP(raw=stream)
    p.sequence(
        p.raw >> fn(lambda df: df) >> p.typed,   # ts already normalized in schema
        PREV >> fn(window_counts) >> p.win,
    )
    assert p["win"].isStreaming, "combinators must preserve streaming-ness"

    q = (p["win"].writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").start())
    q.processAllAvailable()
    q.stop()

    # re-create as a fresh frame: psi_score self-joins the counts
    # (win_tot is derived from win), and the memory-sink relation trips
    # Spark's reference dedup when both sides share its exact subtree.
    # Bounded: one row per (window, type) cell.
    mem = spark.table("win_counts")
    streamed = spark.createDataFrame(mem.collect(), mem.schema)
    n_batches = 2  # two files, one per trigger

    # 1) streaming windowed counts == batch window() counts, same data
    batch_counts = window_counts(events)
    diff = (streamed.exceptAll(batch_counts).count()
            + batch_counts.exceptAll(streamed).count())
    if diff != 0:
        print(f"FAIL: streamed window counts differ from batch ({diff} rows)")
        return 1
    print(f"OK streaming window counts == batch counts "
          f"({streamed.count()} cells, {n_batches} micro-batches)")

    # 2) PSI over the streamed counts reproduces the ORACLED gate rows
    base = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_base"))
    tot = events.groupBy().agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.countDistinct("event_type").alias("k_types"))
    mine = psi_score(streamed, base, tot).collect()
    gate = g.run(spark, "q_stream_drift", sf_dir).collect()
    if mine != gate:
        print(f"FAIL: PSI rows differ from the q_stream_drift gate\n"
              f"  mine: {mine[:3]}\n  gate: {gate[:3]}")
        return 1
    print(f"OK python-authored streaming drift == q_stream_drift gate "
          f"({len(mine)} windows)")
    shutil.rmtree(stage, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
