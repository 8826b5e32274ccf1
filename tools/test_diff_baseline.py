#!/usr/bin/env python3
"""Planted-case unit test for tools/diff_baseline.py's dual host-factor
adjudication (run directly: `python3 tools/test_diff_baseline.py`; also
wired into tools/judge_gate.sh).

Case 1 reconstructs the r10 judge-run phantom-regression shape: the
anchor drifts to 0.90x its baseline while every other query drifts
1.40x (uniform host load — 1.40/0.90 = 1.56x anchor-normalized, over
the 1.5 threshold exactly like the judge's 32 phantom flags). The
dual rule must flag NOTHING: under the median normalization every
bulk query sits at 1.0x.

Case 2 plants one genuine regression (3x its baseline) inside the same
skewed-anchor run; it must be flagged — it exceeds the threshold under
both the anchor and the median normalization.

Case 3: a failed query in the run forces exit-worthy output even with
zero regressions.
"""
import sys

from diff_baseline import diff


def _mk(names, base_secs, run_factor):
    base = {"anchor_query": "q28a", "queries": {"q28a": 3.0}}
    run = {"queries": {"q28a": 3.0 * 0.90}, "failed": []}
    for i, n in enumerate(names):
        b = base_secs[i % len(base_secs)]
        base["queries"][n] = b
        run["queries"][n] = b * run_factor
    return base, run


def main() -> int:
    names = [f"q{i:03d}" for i in range(40)]
    secs = [0.2, 0.41, 0.9, 2.0]

    # Case 1: uniform 1.4x drift, anchor at 0.90x — the phantom shape.
    base, run = _mk(names, secs, 1.40)
    r = diff(base, run, threshold=1.5)
    assert r["regressions"] == [], (
        "phantom case flagged regressions: %r" % r["regressions"])
    # the anchor-only witness list carries the bulk instead
    assert len(r["anchor_only"]) == len(names), (
        "expected every bulk query as an anchor-only witness, got %d"
        % len(r["anchor_only"]))
    assert abs(r["median_factor"] - 1.40) < 1e-9
    assert abs(r["anchor_factor"] - 0.90) < 1e-9

    # Case 2: same skewed-anchor host, one genuine 3x regression.
    base, run = _mk(names, secs, 1.40)
    run["queries"]["q007"] = base["queries"]["q007"] * 3.0
    r = diff(base, run, threshold=1.5)
    flagged = [e["name"] for e in r["regressions"]]
    assert flagged == ["q007"], "expected exactly [q007], got %r" % flagged
    e = r["regressions"][0]
    assert e["via_anchor"] > 1.5 and e["via_median"] > 1.5

    # Case 3: run failures surface regardless of timings.
    base, run = _mk(names, secs, 1.0)
    run["queries"]["q28a"] = 3.0
    run["failed"] = ["q_broken"]
    r = diff(base, run, threshold=1.5)
    assert r["failed"] == ["q_broken"]
    assert r["regressions"] == []
    assert not r["broad_regression"]

    # Case 4: code-wide slowdown — every bulk query at 1.7x while the
    # anchor holds 0.90x (host load would move the anchor too). The
    # median absorbs the slowdown so per-query via_median ratios are
    # 1.0x and no individual query is flagged; the broad_regression
    # signature must fire instead of the run exiting clean.
    base, run = _mk(names, secs, 1.70)
    r = diff(base, run, threshold=1.5)
    assert r["regressions"] == [], (
        "broad case should have no per-query flags, got %r" % r["regressions"])
    assert r["broad_regression"], (
        "median %.2f over threshold with anchor %.2f must set broad_regression"
        % (r["median_factor"], r["anchor_factor"]))
    # ...and the phantom shape from Case 1 (median 1.40 under the 1.5
    # threshold) must NOT fire it:
    base, run = _mk(names, secs, 1.40)
    assert not diff(base, run, threshold=1.5)["broad_regression"]

    print("test_diff_baseline: 4/4 cases pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
