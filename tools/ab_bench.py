#!/usr/bin/env python3
"""Bracketed A/B bench: control -> candidate -> control in ONE window.

Same-box drift reaches +/-20% across hours and +/-6% between back-to-back
runs (PERF.md rounds 11-13), so a raw round-over-round total is
uninterpretable. The house discipline (r12, mandated as a committed
artifact by the r13 verdict): bench the CONTROL tree before AND after
the candidate in one window, quote the candidate against the ADJACENT
control, and quote the control's self-drift as the noise bound. This
tool runs all three legs with the flat classpath (no sbt lock) and
commits each leg's full JSON line to a file.

Usage:
  python3 tools/ab_bench.py --control <git-ref> [--out-prefix BENCH_LOCAL_r14]
      [--sf /root/testdata/sf0.1] [--cpus 4] [--runs 3] [--heap 8g]
      [--queries q1,q2,...] [--skip-compile]

The candidate is ALWAYS the current working tree's compiled classes
(target/scala-2.13/classes — compile first). The control ref is checked
out into a git worktree under /tmp and compiled there once (reused on
re-runs when the worktree already sits on the requested ref).

Outputs: <out-prefix>_control1.json, <out-prefix>_candidate.json,
<out-prefix>_control2.json (full per-query maps), plus a stdout summary
of candidate-vs-adjacent-control per-query ratios and control
self-drift.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADD_OPENS_PKGS = [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar",
]
ADD_OPENS = [a for p in ADD_OPENS_PKGS
             for a in ("--add-opens", f"java.base/{p}=ALL-UNNAMED")]


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, **kw)


def prepare_control(ref, skip_compile):
    wt = f"/tmp/graft_ab_{ref.replace('/', '_')}"
    head = None
    if os.path.isdir(wt):
        r = subprocess.run(["git", "-C", wt, "rev-parse", "HEAD"],
                           capture_output=True, text=True)
        head = r.stdout.strip() if r.returncode == 0 else None
    want = subprocess.run(["git", "-C", REPO, "rev-parse", ref],
                          capture_output=True, text=True,
                          check=True).stdout.strip()
    if head != want:
        if os.path.isdir(wt):
            subprocess.run(["git", "-C", REPO, "worktree", "remove",
                            "--force", wt], check=False)
        sh(["git", "-C", REPO, "worktree", "add", "--force", wt, ref])
    classes = os.path.join(wt, "target/scala-2.13/classes")
    # the marker is written ONLY after a successful compile and keyed on
    # the commit sha — a worktree left by an interrupted sbt run (classes/
    # exists but half-built) never passes for a compiled control leg
    marker = os.path.join(wt, "target", ".graft_ab_compiled")
    marker_ok = os.path.isdir(classes) and os.path.isfile(marker) and \
        open(marker).read().strip() == want
    if marker_ok and skip_compile:
        pass
    elif marker_ok:
        # clean reuse is safe without --skip-compile too: control worktrees
        # are never edited, so sha-keyed classes are current by definition
        pass
    else:
        if skip_compile:
            sys.exit(f"--skip-compile: no verified compile marker for {want}"
                     f" in {wt} — run once without --skip-compile first")
        if os.path.isfile(marker):
            os.remove(marker)
        sh(["sbt", "-batch", "compile"], cwd=wt)
        with open(marker, "w") as f:
            f.write(want + "\n")
    return classes


def run_bench(classes, out_file, args):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=args.sf,
               SPARK_GRAFT_CPUS=str(args.cpus),
               SPARK_GRAFT_BENCH_RUNS=str(args.runs),
               SPARK_GRAFT_BENCH_OUT=out_file)
    if args.queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = args.queries
    cmd = (["java"] + ADD_OPENS +
           [f"-Xmx{args.heap}", "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            "-cp", f"{classes}:/opt/spark/jars/*", "graft.Bench"])
    print("+ bench ->", out_file, flush=True)
    subprocess.run(cmd, check=True, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out_file) as f:
        return json.loads(f.readline())


def summarize(c1, cand, c2):
    q1, qc, q2 = c1["queries"], cand["queries"], c2["queries"]
    common = sorted(set(q1) & set(qc) & set(q2))
    if not common:
        print("no common queries between legs")
        return
    # adjacent control = elementwise mean of the two brackets
    ratios = {k: qc[k] / ((q1[k] + q2[k]) / 2) for k in common
              if q1[k] + q2[k] > 0}
    drift = {k: q2[k] / q1[k] for k in common if q1[k] > 0}
    med = statistics.median(ratios.values())
    med_drift = statistics.median(drift.values())
    print(f"\n== A/B summary over {len(common)} common queries ==")
    print(f"control1 total {c1['value']:.1f}s  candidate total "
          f"{cand['value']:.1f}s  control2 total {c2['value']:.1f}s")
    print(f"median candidate/control ratio: {med:.3f}")
    print(f"median control self-drift (c2/c1): {med_drift:.3f} "
          "(the noise bound — candidate deltas inside it are weather)")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    print("largest candidate/control ratios:")
    for k, r in worst:
        print(f"  {k}: {r:.2f} (ctrl {q1[k]:.3f}/{q2[k]:.3f}s, "
              f"cand {qc[k]:.3f}s, self-drift {drift.get(k, float('nan')):.2f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--control", required=True,
                    help="git ref of the control tree (e.g. the prior round's close commit)")
    ap.add_argument("--out-prefix", default="BENCH_LOCAL_AB")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--heap", default="8g")
    ap.add_argument("--queries", default="",
                    help="comma-separated subset (default: full suite)")
    ap.add_argument("--skip-compile", action="store_true",
                    help="reuse an existing compiled control worktree as-is")
    args = ap.parse_args()

    cand_classes = os.path.join(REPO, "target/scala-2.13/classes")
    if not os.path.isdir(cand_classes):
        print("candidate classes missing — run `sbt compile` first",
              file=sys.stderr)
        return 1
    ctrl_classes = prepare_control(args.control, args.skip_compile)

    pre = os.path.join(REPO, args.out_prefix)
    c1 = run_bench(ctrl_classes, f"{pre}_control1.json", args)
    cand = run_bench(cand_classes, f"{pre}_candidate.json", args)
    c2 = run_bench(ctrl_classes, f"{pre}_control2.json", args)
    summarize(c1, cand, c2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
