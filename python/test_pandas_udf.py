"""pandas/Arrow UDF leg through the PySpark facade.

A pyspark user's first escape hatch is ``pandas_udf``; this gates that
a vectorized Python UDF composes with (a) the engine's native codegen
kernels and (b) a graft query result — the two integration seams.

Leg 1 — kernel parity: a pandas reimplementation of the text-normalize
contract is compared row-for-row against the native `graft_normtext`
Catalyst expression over the full documents corpus (the kernel is
spec-pinned bit-identical to
``lower(trim(regexp_replace(regexp_replace(text,'[^a-zA-Z0-9 ]',''),' +',' ')))``
— TextExpressionsSpec; this leg proves the Arrow batch path sees the
same bytes).

Leg 2 — composition: a ``pandas_udf`` applied to the OUTPUT of a
registered graft query (`q_lang_filter`), parity-checked against the
equivalent JVM expression on the same frame.

Run from a stock pyspark (graft classes on the driver classpath)::

    cd /root/repo/python && python3 test_pandas_udf.py [sfDir]
"""
import sys

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

import graft_py as g

REPO_CLASSES = "/root/repo/target/scala-2.13/classes"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = g.session(
        cpus=4,
        extra_conf={"spark.driver.extraClassPath": REPO_CLASSES})

    # pandas_udf type parsing needs the live session — define after it
    @pandas_udf("string")
    def norm_text_py(s: pd.Series) -> pd.Series:
        return (s.str.replace(r"[^a-zA-Z0-9 ]", "", regex=True)
                 .str.replace(r" +", " ", regex=True)
                 .str.strip()
                 .str.lower())

    @pandas_udf("long")
    def size_tier_py(n: pd.Series) -> pd.Series:
        # deterministic 3-tier bucket: <500 / <2000 / rest
        return pd.cut(n, bins=[-1, 499, 1999, 1 << 62],
                      labels=False).astype("int64")

    # Leg 1: pandas UDF vs the native codegen kernel, whole corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cmp1 = (docs
            .withColumn("py", norm_text_py(F.col("text")))
            .withColumn("jvm", F.expr("graft_normtext(text)")))
    n_docs = cmp1.count()
    n_diff1 = cmp1.filter(~F.col("py").eqNullSafe(F.col("jvm"))).count()
    if n_docs == 0 or n_diff1 != 0:
        print(f"FAIL leg1: {n_diff1} mismatches over {n_docs} docs")
        return 1
    print(f"OK leg1: pandas_udf == graft_normtext on all {n_docs} docs")

    # Leg 2: pandas UDF over a graft query result vs the JVM expression
    q = g.run(spark, "q_lang_filter", sf_dir)
    cmp2 = (q.withColumn("tier_py", size_tier_py(F.col("n_chars")))
             .withColumn("tier_jvm",
                         F.when(F.col("n_chars") < 500, 0)
                          .when(F.col("n_chars") < 2000, 1)
                          .otherwise(2).cast("long")))
    n_rows = cmp2.count()
    n_diff2 = cmp2.filter(F.col("tier_py") != F.col("tier_jvm")).count()
    if n_rows == 0 or n_diff2 != 0:
        print(f"FAIL leg2: {n_diff2} mismatches over {n_rows} rows")
        return 1
    print(f"OK leg2: pandas_udf over q_lang_filter == JVM expr on all "
          f"{n_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
