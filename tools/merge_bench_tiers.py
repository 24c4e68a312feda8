#!/usr/bin/env python3
"""Merge per-tier bench lines into one memory-matched artifact.

Each workload tier of the suite wants a different executor heap (PERF.md
round-6 sf10 findings: GC-bound explode tiers degrade ~12x on big heaps,
spill-bound wide joins need them). A single-JVM local bench therefore
cannot produce one honest number per query from one heap; the
memory-matched artifact takes, per query, the BEST median across the
tier runs and records which tier produced it — the local simulation of
submitting each job to the right executor pool.

Usage: merge_bench_tiers.py out.json base.json:tier [more.json:tier ...]
The first file is the base; the universe is the UNION of every tier's
attempted queries (successes + reported errors), so a query that crashed
in the base tier but succeeded elsewhere is still merged, and a query
with no successful run in ANY tier triggers the WARNING instead of
silently vanishing from a full-looking total.
"""
import json, sys


def main(out_path, specs):
    merged, tiers, srcs = {}, {}, {}
    meta = None
    universe = set()
    for spec in specs:
        path, tier = spec.rsplit(":", 1)
        line = json.load(open(path))
        if meta is None:
            meta = line
        srcs[tier] = path.split("/")[-1]
        universe |= set(line["queries"]) | set(line.get("errors", []))
        # surface per-tier errors so a crashed tier is never silently clean
        for q in line.get("errors", []):
            print(f"note: {tier} reported ERROR for {q} — not merged from this tier")
        for q, sec in line["queries"].items():
            if q not in merged or sec < merged[q]:
                merged[q] = sec
                tiers[q] = tier
    missing = universe - set(merged)
    if missing:
        print(f"WARNING: base queries with no successful tier run: {sorted(missing)}")
    total = round(sum(merged.values()), 3)
    out = {
        "metric": "total", "value": total, "unit": "sec",
        "runs": meta.get("runs"), "sf": meta.get("sf"),
        "queries": merged,
        "tier": tiers,
        "tier_counts": {t: sum(1 for v in tiers.values() if v == t)
                        for t in srcs},
        "tier_sources": srcs,
        "note": ("per-query best median across memory-matched heap tiers; "
                 "'tier' names the winning pool per query (PERF.md round-7)"),
    }
    json.dump(out, open(out_path, "w"), separators=(",", ":"))
    print(f"{out_path}: {len(merged)} queries, total {total}s, "
          f"tiers {out['tier_counts']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
