#!/usr/bin/env python3
"""Anchor-normalized diff of a graft.Bench run against BASELINE_QUERIES.json.

Usage: sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | \
           python3 tools/diff_baseline.py [--threshold 1.3] [baseline.json]

For every query present in both, computes
    ratio = (run_secs / run_anchor) / (baseline_secs / baseline_anchor)
— the host-drift-safe comparison (BASELINE.md: raw seconds drift up to
~1.5x between runs; the q28a_jaccard_pairs anchor normalizes it out).
Prints regressions over the threshold, new/removed queries, and run
failures. Exit code 1 if any regression or failure. Remember the
documented adjudication rule before filing a regression: one min-of-3
run is noise — re-run the flagged queries min-of-9 on a quiet host.
"""
import json
import sys


def main() -> int:
    args = sys.argv[1:]
    threshold = 1.3
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i:i + 2]
    baseline_path = args[0] if args else "BASELINE_QUERIES.json"
    base = json.load(open(baseline_path))
    run = json.loads(sys.stdin.read().strip().splitlines()[-1])
    bq, rq = base["queries"], run["queries"]
    anchor = base["anchor_query"]
    ab, ar = bq[anchor], rq.get(anchor)
    if not ar or ar <= 0:
        print(f"FATAL: anchor {anchor} missing/failed in the run")
        return 1
    failed = run.get("failed", [])
    if isinstance(failed, str):
        failed = json.loads(failed)
    regress = []
    for name in sorted(set(bq) & set(rq)):
        if bq[name] <= 0 or rq[name] <= 0:
            continue
        ratio = (rq[name] / ar) / (bq[name] / ab)
        if ratio > threshold:
            regress.append((ratio, name, rq[name], bq[name]))
    print(f"anchor: run {ar:.2f}s vs baseline {ab:.2f}s "
          f"(host factor {ar / ab:.2f}x); threshold {threshold}x")
    print(f"queries: run {len(rq)}, baseline {len(bq)}; "
          f"new {sorted(set(rq) - set(bq))}; removed {sorted(set(bq) - set(rq))}")
    if failed:
        print(f"FAILED in run: {failed}")
    for ratio, name, r, b in sorted(regress, reverse=True):
        print(f"  {ratio:5.2f}x  {name}: {r:.2f}s vs baseline {b:.2f}s")
    if not regress and not failed:
        print("no anchor-normalized regressions")
    return 1 if (regress or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
