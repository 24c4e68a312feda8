"""Python-AUTHORED q_pipeline_docs — the facade as an authoring surface.

Re-authors the Scala gate `graft.ops.Llm.q_pipeline_docs` from Python
using the graft_dpp combinators (the reference's own expression algebra)
over ordinary pyspark DataFrames, then hash-compares the result against
the engine's registered gate run through `graft_py.run`.  Every step is
a lazy pyspark transform, so Catalyst fuses the four-step pipeline into
one plan exactly as the Scala gate does; the dedup step uses the same
keep-min-id window formulation as `graft.ops.Scale.dedupKeepFirst`, and
the normalize step goes through the engine's native `graft_normtext`
codegen kernel (registered in the session's FunctionRegistry by
`graft_py.install`).

Run from a stock pyspark (graft classes on the driver classpath)::

    cd /root/repo/python && python3 author_pipeline_docs.py [sfDir]

Prints the shared hash and row count; exits non-zero on any mismatch.
"""
import hashlib
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

import graft_py as g
from graft_dpp import DPP, PREV, fn

REPO_CLASSES = "/root/repo/target/scala-2.13/classes"


def normalize(df):
    # the Scala gate's md5(Vec.normText(text)) — same native kernel
    return df.withColumn("norm_key", F.expr("md5(graft_normtext(text))"))


def lang_filter(df):
    return df.filter(F.col("lang").isin("es", "de", "zh"))


def dedup(df):
    # ≡ Scale.dedupKeepFirst(df, [norm_key], [doc_id])
    w = Window.partitionBy("norm_key").orderBy("doc_id")
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def project(df):
    return df.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


def digest(df):
    rows = sorted(tuple(r) for r in df.collect())
    return len(rows), hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = g.session(
        cpus=4,
        extra_conf={"spark.driver.extraClassPath": REPO_CLASSES})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = DPP(docs=docs)
    p.sequence(
        p.docs >> fn(normalize) >> p.normed,
        PREV >> fn(lang_filter) >> p.kept,
        PREV >> fn(dedup) >> p.unique,
        PREV >> fn(project) >> p.result,
    )

    n_mine, h_mine = digest(p["result"])
    n_gate, h_gate = digest(g.run(spark, "q_pipeline_docs", sf_dir))

    if n_mine == 0:
        print("FAIL: empty result")
        return 1
    if (n_mine, h_mine) != (n_gate, h_gate):
        print(f"FAIL: python-authored ({n_mine} rows, {h_mine}) != "
              f"scala gate ({n_gate} rows, {h_gate})")
        return 1
    print(f"OK python-authored q_pipeline_docs == scala gate: "
          f"{n_mine} rows, md5 {h_mine}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
