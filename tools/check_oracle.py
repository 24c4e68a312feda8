#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
query in DuckDB against the sf parquet tables and compare (schema-name set,
row count, values) with the Spark-written parquet in the verify out dir.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v

def frame(con, sql):
    cur = con.sql(sql)
    cols = [c.lower() for c in cur.columns]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    rows_sorted = [tuple(canon(r[i]) for i in order) for r in rows]
    return cols_sorted, rows_sorted

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            ocols, orows = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            scols, srows = frame(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            failures += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ\n  oracle: {ocols}\n  spark:  {scols}")
            failures += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count {len(orows)} (oracle) vs {len(srows)} (spark)")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(orows, srows)):
            if a != b:
                # float tolerance report (still a failure — driver hashes exact)
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at row {i}")
            for c, x, y in zip(ocols, a, b):
                if x != y:
                    print(f"    col {c}: oracle={x!r} spark={y!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(orows)} rows)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
