#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
query in DuckDB against the sf parquet tables and compare with the
Spark-written parquet in the verify out dir.

Mirrors the DRIVER's comparison path (pandas), not a hand-rolled value
compare: both sides go through DataFrame → lowercase/sort columns →
sort_values over all columns → hash_pandas_object. That reproduces the
driver's failure modes too — list/bytes-typed cells raise inside
sort_values/hash (unhashable type), exactly as in the round-1 driver run,
so such queries FAIL here instead of passing locally and erroring in the
round gate.

Also checks queries WITHOUT an oracle (rows-only in the driver): their
Spark parquet must still survive the pandas sort/hash path.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import glob, json, math, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def frame(con, sql):
    """DataFrame → (sorted-cols frame, row hash) the way the driver does."""
    df = con.sql(sql).df()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = pd.util.hash_pandas_object(df, index=False)
    return df, int(h.sum()) & (2**64 - 1)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    import os
    for t in TABLES:
        # driver tables are single files; locally-generated scale sets
        # (GenSf1) are Spark-style DIRECTORIES of part files — read both
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    out_queries = sorted(
        p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out_dir}/*/"))
    failures = 0
    for name in out_queries:
        try:
            sdf, shash = frame(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable/unhashable (driver would error): "
                  f"{type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK   {name} ({len(sdf)} rows, rows-only: no oracle)")
            continue
        try:
            odf, ohash = frame(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(odf.columns)}\n  spark:  {list(sdf.columns)}")
            failures += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: row count {len(odf)} (oracle) vs {len(sdf)} (spark)")
            failures += 1
            continue
        if ohash != shash:
            print(f"FAIL {name}: hash mismatch")
            # best-effort first-diff report for debugging
            try:
                neq = (odf != sdf) & ~(odf.isna() & sdf.isna())
                rows = neq.any(axis=1)
                i = int(rows.idxmax()) if rows.any() else -1
                if i >= 0:
                    for c in odf.columns:
                        x, y = odf.at[i, c], sdf.at[i, c]
                        isnan = (isinstance(x, float) and isinstance(y, float)
                                 and math.isnan(x) and math.isnan(y))
                        if x != y and not isnan:
                            print(f"    row {i} col {c}: oracle={x!r} spark={y!r}")
            except Exception:
                pass
            failures += 1
        else:
            print(f"OK   {name} ({len(odf)} rows)")
    missing = sorted(set(oracles) - set(out_queries))
    for name in missing:
        print(f"FAIL {name}: oracle declared but no spark output directory")
        failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
