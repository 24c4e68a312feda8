#!/usr/bin/env python3
"""Drift-normalized round-over-round bench report.

Bench emits `drift_control` (summed median of 10 pinned, code-frozen
scalar-fn queries) precisely so two benches taken in different load
windows can be compared — but until r15 nothing CONSUMED it: every
verdict re-derived the normalization by hand. This tool reads two bench
artifacts (a named prior round's and the current one), divides each
query's time by its artifact's drift index, and reports the normalized
deltas — the regression table the next verdict quotes, one command:

    python3 tools/bench_report.py BENCH_r14.json BENCH_r15.json
    python3 tools/bench_report.py BENCH_LOCAL_r14_final.json \
        target/BENCH_LOCAL_r15.json --top 15 --floor 0.2

Accepts BOTH artifact shapes: the full single-line JSON `graft.Bench`
writes via SPARK_GRAFT_BENCH_OUT (and tools/ab_bench.py), and the
driver's wrapper `{n, rc, cpus, sf, tail, parsed}` whose bounded stdout
tail begins MID-JSON — the per-query map is recovered from the tail
fragment and the headline numbers from the `total_echo` trailer that
Bench prints for exactly this reason.

Interpretation guardrails baked in:
- drift_control_n (when present) must be 10 in both artifacts — a pin
  that errored or was filtered silently shrinks the index (ADVICE r14);
  the report warns and falls back to RAW deltas.
- queries under --floor seconds (default 0.2 raw) are excluded from the
  regression table: sub-200 ms medians move ±40% with scheduler noise
  (every r14 "tail regression" was this class).
- the headline is the normalized TOTAL ratio over the common query set,
  plus per-side query counts so added/removed gates are visible.
"""
import argparse
import json
import re
import sys

DRIFT_PIN_COUNT = 10


def load(path):
    """Return (queries: dict, meta: dict) from either artifact shape."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:          # full Bench JSON line
        return doc["queries"], doc
    if "tail" in doc:             # driver wrapper with truncated stdout tail
        tail = doc["tail"]
        if doc.get("parsed"):
            p = doc["parsed"]
            return p.get("queries", {}), p
        # per-query map: the tail may begin mid-map, so take every
        # "q_name":float pair BEFORE the skew map (queries are the only
        # q_-prefixed keys in the line)
        qpart = tail.split('"skew"')[0]
        queries = {m.group(1): float(m.group(2)) for m in
                   re.finditer(r'"(q_[a-zA-Z0-9_]+)":([0-9.]+)', qpart)}
        # headline numbers from the total_echo trailer (survives truncation)
        meta = {}
        for m in re.finditer(r'\{"metric":"total_echo".*?\}', tail):
            meta = json.loads(m.group(0))
        return queries, meta
    sys.exit(f"{path}: neither a Bench JSON line nor a driver artifact")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prior", help="prior round's bench artifact")
    ap.add_argument("current", help="current bench artifact")
    ap.add_argument("--top", type=int, default=12,
                    help="rows per direction in the delta tables")
    ap.add_argument("--floor", type=float, default=0.2,
                    help="exclude queries under this many RAW seconds "
                         "(both rounds) from the per-query tables")
    args = ap.parse_args()

    qa, ma = load(args.prior)
    qb, mb = load(args.current)
    da, db = ma.get("drift_control"), mb.get("drift_control")
    na = ma.get("drift_control_n", DRIFT_PIN_COUNT if da else None)
    nb = mb.get("drift_control_n", DRIFT_PIN_COUNT if db else None)

    normalized = bool(da and db)
    if normalized and (na != DRIFT_PIN_COUNT or nb != DRIFT_PIN_COUNT):
        print(f"WARN: drift_control_n {na}/{nb} != {DRIFT_PIN_COUNT} — a pin "
              "errored or was filtered; falling back to RAW comparison")
        normalized = False
    if not normalized and not (da and db):
        print("WARN: drift_control missing from an artifact — RAW comparison")
    fa = da if normalized else 1.0
    fb = db if normalized else 1.0

    common = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if not common:
        sys.exit("no common queries between the two artifacts")

    tot_a = sum(qa[k] for k in common)
    tot_b = sum(qb[k] for k in common)
    label = "drift-normalized" if normalized else "RAW"
    print(f"== {label} round-over-round: {args.prior} -> {args.current} ==")
    print(f"common queries: {len(common)}  "
          f"(prior-only: {len(only_a)}, new: {len(only_b)})")
    if only_b:
        print(f"  new gates: {', '.join(only_b[:20])}"
              + (" ..." if len(only_b) > 20 else ""))
    if only_a:
        print(f"  removed: {', '.join(only_a[:20])}")
    if normalized:
        print(f"drift_control: prior {da:.3f}s, current {db:.3f}s "
              f"(load ratio {db / da:.3f} — raw deltas inside this are weather)")
    print(f"common-set total: prior {tot_a:.1f}s -> current {tot_b:.1f}s "
          f"(raw {tot_b / tot_a:.3f}x"
          + (f", normalized {(tot_b / fb) / (tot_a / fa):.3f}x)" if normalized
             else ")"))

    # per-query normalized ratios over the noise floor
    rows = [(k, qa[k], qb[k], (qb[k] / fb) / (qa[k] / fa))
            for k in common
            if qa[k] >= args.floor and qb[k] >= args.floor and qa[k] > 0]
    if not rows:
        print(f"(no common queries at or above the {args.floor}s floor)")
        return
    rows.sort(key=lambda r: -r[3])

    def table(title, subset):
        if not subset:
            return
        print(f"\n{title}")
        print(f"  {'query':<28} {'prior':>8} {'curr':>8} {'norm-ratio':>10}")
        for k, a, b, r in subset:
            print(f"  {k:<28} {a:>7.3f}s {b:>7.3f}s {r:>9.2f}x")

    table(f"largest regressions (>= {args.floor}s both rounds):",
          [r for r in rows if r[3] > 1.0][:args.top])
    table("largest improvements:",
          sorted([r for r in rows if r[3] < 1.0], key=lambda r: r[3])[:args.top])


if __name__ == "__main__":
    main()
