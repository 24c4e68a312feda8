#!/usr/bin/env python3
"""Scale-sweep variant of check_oracle.py: same frame/hash semantics
(lowercase + sorted columns, sort_values over all columns,
hash_pandas_object), but each DuckDB oracle runs in its own SUBPROCESS
under a per-query time budget — at sf10+ a handful of kernel-replica
oracles (recursive CTEs, HUGEINT splitmix chains) are orders of
magnitude slower than the engine under test, and a sweep must record
"oracle exceeded budget" instead of hanging the whole run. Results land
in a JSON artifact: per query {status, seconds, rows} with status one of
ok / mismatch / oracle_timeout / oracle_error / spark_unreadable.

Usage: sweep_oracle.py <sfDir> <verifyOutDir> <out.json> [budget_s] [only_q1,q2,...]
"""
import glob, json, os, subprocess, sys, time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

CHILD = r'''
import json, sys
import duckdb
import pandas as pd
sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
import os
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
# concurrent sweeps share the box: cap each child's fan-out/footprint
if os.environ.get("SWEEP_DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['SWEEP_DUCKDB_THREADS'])}")
if os.environ.get("SWEEP_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['SWEEP_DUCKDB_MEM']}'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    src = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
def frame(sql):
    df = con.sql(sql).df()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = pd.util.hash_pandas_object(df, index=False)
    return df, int(h.sum()) & (2**64 - 1)
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
# decade-sweep overrides: oracle forms too slow for the driver gate's
# bulletproof originals, carrying execution pragmas
ov_path = f"{out_dir}/oracle_sql_sweep_overrides.json"
if os.path.exists(ov_path):
    oracles.update(json.load(open(ov_path)))
sdf, shash = frame(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
if name not in oracles:
    print(json.dumps({"status": "rows_only", "rows": len(sdf)}))
    sys.exit(0)
sql = oracles[name]
# enforce per-oracle pragmas: "-- SWEEP_THREADS=k" pins the thread count
# (DuckDB v1.0 parallel-lambda wrongness; see PERF.md round 10)
import re as _re
m = _re.match(r"\s*--\s*SWEEP_THREADS=(\d+)", sql)
if m:
    con.execute(f"SET threads={int(m.group(1))}")
odf, ohash = frame(sql)
if list(odf.columns) != list(sdf.columns):
    print(json.dumps({"status": "mismatch", "why": "columns",
                      "oracle": list(odf.columns), "spark": list(sdf.columns)}))
elif len(odf) != len(sdf):
    print(json.dumps({"status": "mismatch", "why": "rows",
                      "oracle_rows": len(odf), "spark_rows": len(sdf)}))
elif ohash != shash:
    print(json.dumps({"status": "mismatch", "why": "hash", "rows": len(sdf)}))
else:
    print(json.dumps({"status": "ok", "rows": len(sdf)}))
'''


def main(sf_dir, out_dir, result_path, budget_s, only):
    queries = sorted(p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out_dir}/*/"))
    if only:
        queries = [q for q in queries if q in only]
    results = {}
    for name in queries:
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", CHILD, sf_dir, out_dir, name],
                               capture_output=True, text=True, timeout=budget_s)
            dt = round(time.time() - t0, 1)
            if p.returncode != 0:
                results[name] = {"status": "oracle_error", "seconds": dt,
                                 "err": (p.stderr or "")[-300:]}
            else:
                r = json.loads(p.stdout.strip().splitlines()[-1])
                r["seconds"] = dt
                results[name] = r
        except subprocess.TimeoutExpired:
            results[name] = {"status": "oracle_timeout", "seconds": budget_s}
        s = results[name]
        print(f"{s['status']:>14} {name} ({s['seconds']}s)", flush=True)
        # checkpoint in the SAME wrapped shape as the final write, with a
        # partial marker — an interrupted sweep must never leave an
        # artifact a final-shape consumer would misparse as complete
        json.dump({"results": results, "partial": True, "budget_s": budget_s,
                   "sf_dir": sf_dir}, open(result_path, "w"), indent=0)
    by = {}
    for r in results.values():
        by[r["status"]] = by.get(r["status"], 0) + 1
    print("summary:", by)
    json.dump({"results": results, "summary": by, "budget_s": budget_s,
               "sf_dir": sf_dir}, open(result_path, "w"), indent=0)


if __name__ == "__main__":
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 1800, only)
