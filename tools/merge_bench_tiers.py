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
The first file is the base (its full query set is the universe); later
files override a query when faster.
"""
import json, sys


def main(out_path, specs):
    base_name = specs[0].rsplit(":", 1)[1]
    merged, tiers, srcs = {}, {}, {}
    meta = None
    for spec in specs:
        path, tier = spec.rsplit(":", 1)
        line = json.load(open(path))
        if meta is None:
            meta = line
        srcs[tier] = path.split("/")[-1]
        for q, sec in line["queries"].items():
            if q not in merged or sec < merged[q]:
                merged[q] = sec
                tiers[q] = tier
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
