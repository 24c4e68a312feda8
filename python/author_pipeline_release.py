"""Python-AUTHORED q_pipeline_release — authoring with I/O at both ends.

author_pipeline_docs.py proves the graft_dpp combinators on the easy
pipeline (four lazy transforms, no side effects). This re-authors the
FULL corpus-release pipeline from Python — snapshot ingest → normalize
→ quality gate → exact dedup → MinHash-LSH near-dup drop → Neyman
stratified sample → corpus card → versioned snapshot publish — and
hash-compares the published card against the engine's registered
`q_pipeline_release` gate.

The composition mixes the two things a real Python author uses:
ordinary pyspark transforms (normalize / quality / exact dedup — the
same formulations the Scala gate builds), and engine operators invoked
through the facade's PyBridge endpoints (snapshot commit/read,
MinHash-LSH victim set, Neyman quota sample, corpus card) — each the
exact call the Scala gate's stage makes, so the result is bit-equal,
not just similar. Snapshot I/O sits at BOTH ends: the raw corpus is
committed and read back at ingest, and the card is committed and read
back at publish (the r14 verdict's "authoring claim is proven on the
easy pipeline only" gap).

Run from a stock pyspark (graft classes on the driver classpath)::

    cd /root/repo/python && python3 author_pipeline_release.py [sfDir]

Prints the shared hash and row count; exits non-zero on any mismatch.
"""
import hashlib
import shutil
import sys
import tempfile

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import graft_py as g
from graft_dpp import DPP, PREV, fn

REPO_CLASSES = "/root/repo/target/scala-2.13/classes"


def digest(df):
    rows = sorted(tuple(r) for r in df.collect())
    return len(rows), hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = g.session(
        cpus=4,
        extra_conf={"spark.driver.extraClassPath": REPO_CLASSES})
    bridge = spark._jvm.graft.PyBridge
    jspark = spark._jsparkSession

    def jdf(jobj):
        return DataFrame(jobj, spark)

    base = tempfile.mkdtemp(prefix="graft_release_py_")
    corpus_snap = f"{base}/corpus_snapshot"
    card_snap = f"{base}/release_card"

    # ---- stages: pyspark transforms + facade-invoked engine operators --
    def ingest(df):
        # snapshot I/O at the FRONT: commit the raw corpus, read the tip
        bridge.snapshotCommit(jspark, df._jdf, corpus_snap)
        return jdf(bridge.snapshotRead(jspark, corpus_snap))

    def normalize(df):
        return (df
                .withColumn("norm_key", F.md5(F.lower(F.trim(F.regexp_replace(
                    F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""),
                    " +", " ")))))
                .withColumn("n_tok", F.size(F.split(F.col("text"), " "))))

    def quality(df):
        return df.filter(F.col("lang").isin("es", "de", "zh")
                         & (F.col("n_tok") >= 5))

    def dedup_exact(df):
        # ≡ Scale.dedupKeepFirst(df, [norm_key], [doc_id])
        w = Window.partitionBy("norm_key").orderBy("doc_id")
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))

    def dedup_near(df):
        # engine operator: MinHash-LSH victim ids (banded, bucket-capped)
        drop = jdf(bridge.minhashDropIds(df.select("doc_id", "text")._jdf, 0.5))
        return df.join(drop, ["doc_id"], "left_anti")

    def neyman(df):
        # engine operator: Neyman-allocation stratified sample (n = 200)
        return jdf(bridge.neymanSample(df._jdf, 200))

    def card(df):
        # engine operator: one-pass corpus card (one row per source)
        return jdf(bridge.corpusCardFrame(jspark, df._jdf))

    def publish(card_df):
        # snapshot I/O at the BACK: versioned commit, then the read-back
        # IS the result (the gate returns committed bytes, not the plan)
        bridge.snapshotCommit(jspark, card_df._jdf, card_snap)
        return jdf(bridge.snapshotRead(jspark, card_snap)).orderBy("source")

    # ---- the composition: same 8-stage sequence as the Scala gate ------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = DPP(raw=docs)
    p.sequence(
        p.raw >> fn(ingest) >> p.corpus,
        PREV >> fn(normalize) >> p.normed,
        PREV >> fn(quality) >> p.kept,
        PREV >> fn(dedup_exact) >> p.uniq,
        PREV >> fn(dedup_near) >> p.deduped,
        PREV >> fn(neyman) >> p.sampled,
        PREV >> fn(card) >> p.card,
        PREV >> fn(publish) >> p.result,
    )

    try:
        n_mine, h_mine = digest(p["result"])
    finally:
        shutil.rmtree(base, ignore_errors=True)
    n_gate, h_gate = digest(g.run(spark, "q_pipeline_release", sf_dir))

    if n_mine == 0:
        print("FAIL: empty result")
        return 1
    if (n_mine, h_mine) != (n_gate, h_gate):
        print(f"FAIL: python-authored ({n_mine} rows, {h_mine}) != "
              f"scala gate ({n_gate} rows, {h_gate})")
        return 1
    print(f"OK python-authored q_pipeline_release == scala gate: "
          f"{n_mine} rows, md5 {h_mine}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
