"""Grouped-map pandas seam through the PySpark facade.

After the scalar ``pandas_udf`` leg (test_pandas_udf.py), the next
escape hatch a migrating pyspark pipeline reaches for is the
GROUPED-map pair: ``applyInPandas`` (whole pandas frame per group) and
``mapInPandas`` (pandas frame per Arrow batch). This gates that both
compose with the engine: group keys arrive complete (one frame per
group, never a partial), batches preserve the installed native
kernels' output bytes, and the results parity-check against the
equivalent JVM aggregation/expression on the same inputs.

Leg 1 — applyInPandas over a graft query result: per-language
doc-count / char-sum / max-doc recomputed in pandas per group,
row-for-row equal to the JVM ``groupBy().agg()`` on the SAME frame.

Leg 2 — applyInPandas sees whole groups: a per-group ``nunique`` of a
group-constant column must be exactly 1 for every emitted row (a
partial-group delivery would break the invariant silently).

Leg 3 — mapInPandas composes with a native codegen kernel: the
``graft_normtext`` column computed by the JVM scan rides through an
Arrow batch transform unchanged, and the pandas-side batch length
bookkeeping sums to the corpus row count (batch plumbing, no drops).

Run from a stock pyspark (graft classes on the driver classpath)::

    cd /root/repo/python && python3 test_grouped_pandas.py [sfDir]
"""
import sys

import pandas as pd
from pyspark.sql import functions as F

import graft_py as g

REPO_CLASSES = "/root/repo/target/scala-2.13/classes"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = g.session(
        cpus=4,
        extra_conf={"spark.driver.extraClassPath": REPO_CLASSES})

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # ---- Leg 1: applyInPandas == JVM groupBy().agg() -------------------
    def lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "sum_chars": [int(pdf["n_chars"].sum())],
            "max_doc": [int(pdf["doc_id"].max())],
        })

    via_pandas = (docs.groupBy("lang")
                  .applyInPandas(lang_stats,
                                 "lang string, n_docs long, "
                                 "sum_chars long, max_doc long")
                  .orderBy("lang").collect())
    via_jvm = (docs.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chars").alias("sum_chars"),
                    F.max("doc_id").alias("max_doc"))
               .orderBy("lang").collect())
    if not via_pandas or [tuple(r) for r in via_pandas] != \
            [tuple(r) for r in via_jvm]:
        print(f"FAIL leg1: applyInPandas {via_pandas} != JVM {via_jvm}")
        return 1
    print(f"OK leg1: applyInPandas == JVM agg over {len(via_pandas)} "
          "language groups")

    # ---- Leg 2: groups arrive WHOLE ------------------------------------
    def group_integrity(pdf: pd.DataFrame) -> pd.DataFrame:
        # lang is the group key: nunique > 1 (mixed group) or a second
        # frame for the same key (split group) would both break parity
        return pd.DataFrame({
            "lang": [pdf["lang"].iloc[0]],
            "n_keys_seen": [int(pdf["lang"].nunique())],
        })

    integ = (docs.groupBy("lang")
             .applyInPandas(group_integrity, "lang string, n_keys_seen long")
             .collect())
    langs = [r["lang"] for r in integ]
    if (not integ or any(r["n_keys_seen"] != 1 for r in integ)
            or len(langs) != len(set(langs))):
        print(f"FAIL leg2: groups not delivered whole: {integ}")
        return 1
    print(f"OK leg2: {len(integ)} groups each delivered as one whole frame")

    # ---- Leg 3: mapInPandas composes with the native kernel ------------
    with_kernel = docs.withColumn("norm", F.expr("graft_normtext(text)"))

    def batch_passthrough(batches):
        for pdf in batches:
            out = pdf[["doc_id", "norm"]].copy()
            out["batch_rows"] = len(pdf)
            yield out

    mapped = with_kernel.mapInPandas(
        batch_passthrough, "doc_id long, norm string, batch_rows long")
    n_docs = docs.count()
    n_mapped = mapped.count()
    # the kernel's bytes must survive the Arrow round trip unchanged
    rejoined = (mapped.alias("m")
                .join(with_kernel.select("doc_id", "norm").alias("k"), "doc_id")
                .filter(~F.col("m.norm").eqNullSafe(F.col("k.norm"))))
    n_diff = rejoined.count()
    if n_mapped != n_docs or n_diff != 0:
        print(f"FAIL leg3: rows {n_mapped}/{n_docs}, byte diffs {n_diff}")
        return 1
    print(f"OK leg3: mapInPandas carried graft_normtext bytes intact over "
          f"all {n_docs} docs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
