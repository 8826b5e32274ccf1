#!/usr/bin/env python3
"""Fit per-query scaling exponents from a graft.Scaling run and write
SCALING.md (r11, VERDICT item 2 — make the 100 TB claims measured).

Usage:
    java ... graft.Scaling > scaling.json   # or runMain graft.Scaling
    python3 tools/fit_scaling.py scaling.json [scaling4.json ...] [-o SCALING.md]

Multiple run files merge per (sf, query), later files winning — the
fourth-decade subset run (graft.Scaling --queries … over the
tools/make_sf4.py sf1 slice plus the three committed dirs) overlays the
base full-surface run. Each query is fitted on the top three decades it
was measured at.

Model: testdata row counts are proportional to sf across every table
(TESTDATA.md), and the three sfs are exact decades apart, so under the
shifted-power model t(sf) = c + a*sf^e the fixed overhead c CANCELS in
differences and the exponent has a closed form:

  e_diff = log10((t_hi - t_mid) / (t_mid - t_lo))

(derivation: with hi = 10*mid = 100*lo, (hi^e - mid^e)/(mid^e - lo^e)
= 10^e exactly). This is strictly better than dividing out an overhead
estimate: subtracting c = t_lo blows up whenever the mid point sits on
the overhead floor (t_mid ~ t_lo), manufacturing phantom exponents of
1.5+ from 20 ms of noise — exactly what the first draft of this tool
did on seven sub-second queries.

Flagging uses a NOISE-BOUNDED exponent: grant every timing DELTA
seconds of measurement noise in the query's favor,

  e_bound = log10((t_hi - t_mid - DELTA) / (t_mid - t_lo + DELTA)),

and flag only entries whose e_bound still exceeds FLAG_E (and whose
top-sf time is at least MIN_SECS — smaller entries are pure timer
noise). Flagged entries must carry a justification in JUSTIFIED below
(output-bound, iterative, guarded anchor, ...) or the tool exits 1 —
the same fail-loud discipline as the plan gates, so a future
super-linear operator cannot land silently.
"""
import json
import math
import re
import sys

FLAG_E = 1.3
MIN_SECS = 0.3
DELTA = 0.05

# Declared super-linear entries, each with the one-line boundedness /
# design justification the judge audits. Keep in sync with VERDICT.md's
# plan-audit table.
JUSTIFIED = {
    "q28a_jaccard_pairs":
        "exact all-pairs similarity anchor — O(n^2) BY DESIGN, config-guarded "
        "(spark.graft.q28a.maxDocs refuses past cap); exists as the drift anchor",
    "dedup_eval_recall":
        "panel truth is fixed (256 docs) but the candidate side joins the full "
        "corpus against it; pair volume grows with corpus x panel — output-bound",
    "dedup_cross_corpus":
        "LSH band equi-join whose TRUE near-dup pair count grows ~quadratically "
        "in the synthetic corpus (shared template text) — output-bound, the "
        "pairs ARE the result",
    "dedup_minhash_lsh":
        "same LSH candidate/true-pair growth as dedup_cross_corpus on the "
        "synthetic near-dup density — output-bound",
    "dedup_minhash_error":
        "estimator-error eval over the LSH candidate pairs — pair volume "
        "grows with the synthetic duplicate density, the equi-join shape "
        "does not change",
    "dedup_ngram_jaccard":
        "n-gram Jaccard verify over LSH candidates; candidate growth is the "
        "synthetic duplicate density, not the operator shape",
    "dedup_simhash":
        "hamming-bucket candidates grow with duplicate density — output-bound",
    "dedup_substring":
        "16-token rolling windows are linear in tokens, but MATCHING window "
        "pairs (the equi-join output on the window hash) grow with "
        "cross-doc repeated-substring density — quadratic within a repeated "
        "template in the synthetic corpus; output-bound, bucketed equi-join",
    "dedup_substring_cut":
        "same window-hash equi-join output growth as dedup_substring, plus "
        "span stitching over the found matches",
    "dedup_substring_spans":
        "same window-hash equi-join output growth as dedup_substring",
    "dedup_containment_exact":
        "prefix-filtered inverted-index verify: candidate postings grow with "
        "shared-token density in the synthetic corpus — candidate-bound, "
        "never all-pairs",
    # dedup_cluster_build left the justified list in r13: the in-bucket
    # spanning-forest edge generation (Dedup.bucketSpanningEdges) made the
    # propagation input linear in postings, and the four-decade min-of-3
    # fit now reads e_bound < 1 (SCALING_RUN4D.json) — no declared bound
    # needed.
    "q102_basket_lift":
        "basket self-join bounded by requireBoundedBaskets; pair volume grows "
        "with basket width in the synthetic data — guarded quadratic",
    "q108_item2item":
        "same guarded basket self-join class as q102",
    "q55_pagerank": "iterative graph loop — supersteps x edges, bounded rounds",
    "q77_khop_reach": "iterative frontier expansion, bounded hops",
    "q109_hits": "iterative graph loop, bounded rounds",
    "q114_sssp": "iterative relaxation, bounded supersteps",
    "q121_join_skew":
        "demonstrates salted two-phase skew mitigation over the synthetic "
        "hot key whose row share grows with sf — the skewed join's subject "
        "scales superlinearly by construction, not the operator",
}


def main() -> int:
    args = sys.argv[1:]
    out_path = "SCALING.md"
    if "-o" in args:
        i = args.index("-o")
        out_path = args[i + 1]
        del args[i:i + 2]
    # One or more run files merge per (sf, query), later files winning —
    # the r12 fourth-decade audit re-times its subset at ALL its sfs in
    # one fresh session (the interleave discipline), so its values
    # override the base run's for those queries.
    src_names = args if args else ["<stdin>"]
    srcs = [open(p).read() for p in args] if args else [sys.stdin.read()]
    runs_meta = None
    sfs = {}
    for src in srcs:
        d = json.loads(src.strip().splitlines()[-1])
        runs_meta = d
        for dir_, qs in d["sfs"].items():
            m = re.search(r"sf([0-9.]+)/?$", dir_)
            if not m:
                print(f"FATAL: cannot parse sf from dir {dir_}")
                return 1
            sfs.setdefault(float(m.group(1)), {}).update(qs)
    d = runs_meta
    if len(sfs) < 3:
        print("FATAL: need 3 scale factors for overhead-adjusted fit")
        return 1
    all_sfs = sorted(sfs)
    names = sorted({n for qs in sfs.values() for n in qs})
    rows = []
    unjustified = []
    for name in names:
        pts = [(sf, sfs[sf][name]) for sf in all_sfs if name in sfs[sf]]
        disp = {sf: t for sf, t in pts}
        # fit on the TOP THREE decades the query was measured at — for
        # the fourth-decade subset that is (0.01, 0.1, 1), where the
        # fixed overhead is proportionally smallest
        top3 = pts[-3:]
        if len(top3) < 3:
            rows.append((name, disp, None, None, None, "FAILED",
                         "measured at fewer than 3 sfs"))
            unjustified.append(name)
            continue
        (lo, t_lo), (mid, t_mid), (hi, t_hi) = top3
        decade = math.log10(hi / mid)
        if abs(math.log10(mid / lo) - decade) > 1e-9:
            rows.append((name, disp, None, None, None, "FAILED",
                         "top-3 sfs are not equal decades"))
            unjustified.append(name)
            continue
        if any(t is None or t <= 0 for t in (t_lo, t_mid, t_hi)):
            rows.append((name, disp, None, None, None, "FAILED", ""))
            unjustified.append(name)
            continue
        e_raw = math.log10(t_hi / t_mid) / decade
        d_hi, d_lo = t_hi - t_mid, t_mid - t_lo
        e_diff = (math.log10(d_hi / d_lo) / decade
                  if d_hi > 0 and d_lo > 0 else None)
        # denominator floored at 10 ms: d_lo + DELTA <= 0 means the
        # scaling part is invisible through sf_mid while the top decade
        # grew — the strongest super-linear signal, not a free pass
        e_bound = (math.log10((d_hi - DELTA) / max(d_lo + DELTA, 0.01)) / decade
                   if d_hi - DELTA > 0 else None)
        if t_hi < MIN_SECS:
            verdict, why = "exempt-small", f"t@sf{hi:g} < {MIN_SECS}s: timer noise"
        elif e_bound is None or e_bound <= FLAG_E:
            verdict, why = "ok", ""
        elif name in JUSTIFIED:
            verdict, why = "justified", JUSTIFIED[name]
        else:
            verdict, why = "FLAG", "super-linear with no declared justification"
            unjustified.append(name)
        rows.append((name, disp, e_raw, e_diff, e_bound, verdict, why))

    counts = {}
    for r in rows:
        counts[r[5]] = counts.get(r[5], 0) + 1
    n4 = sum(1 for r in rows if len(r[1]) > 3)
    with open(out_path, "w") as f:
        sf_cols = " | ".join(f"t@sf{sf:g}" for sf in all_sfs)
        f.write(f"""# SCALING — measured per-query scaling exponents (r13)

Generated by `tools/fit_scaling.py {' '.join(src_names)}` from
`graft.Scaling` runs (min-of-{d.get('runs', '?')} per query per sf, one
JVM per run, local[{d.get('cpus', '?')}]) — re-run that exact command to
reproduce this file byte-identically.
Testdata rows are proportional to sf across all tables and the sfs are
exact decades, so under t(sf) = c + a·sf^e the fixed overhead cancels
in differences and `e_diff = log10((t_hi−t_mid)/(t_mid−t_lo))` over a
query's TOP THREE measured decades is the exact shifted-power exponent.
`e_bound` grants every timing {DELTA} s of noise in the query's favor —
the flag statistic, so 20 ms wiggles on an overhead-floor mid point
cannot manufacture a phantom exponent. `e_raw` (log-ratio of the top
decade, no overhead model) is shown for reference. Entries under
{MIN_SECS} s at their top sf are exempt (timer noise dominates).
Entries whose e_bound exceeds {FLAG_E} must carry a declared
justification or the tool exits 1.

{n4} entries carry a FOURTH decade (r12): a synthetic 10×-sf0.1 slice
(`tools/make_sf4.py` — documents regenerated at the driver generator's
measured distributions so near-dup pair density scales as the real data
does; events/orders/lineitem/customer replicated with key shifts),
timed by `graft.Scaling --queries …` over all four dirs in one session.
Those entries' exponents fit (sf0.01, sf0.1, sf1) — the decades where
fixed overhead is proportionally smallest — which adjudicates the
former near-flag band (e_bound 1.24–1.29 on three points).

The r13 additions (SCALING_RUN4D/E): the seven r12 smoke suspects
(dedup_cluster_build, dedup_simhash, dedup_containment_exact,
q66_triangles, q87_clustering_coeff, sample_bootstrap, text_bigram_lm)
now carry min-of-3 fourth-decade fits. dedup_cluster_build and
q66/q87 were FIXED first (in-bucket spanning-forest edge generation;
per-bucket local top-k kNN — see the r13 scaladocs) and re-measured:
all three read e_bound < 1.1 after the fix. One caveat for the two
embeddings-backed graph entries (q66/q87): the embeddings table scales
4×/decade at the driver but 10× in the synthetic sf1 slice, so their
top step is a true ROWS-decade while the lower steps are 4× — a
perfectly linear query reads e_diff ≈ 1.08 under that mix, i.e. the
1.3 flag is slightly STRICTER than a pure row exponent there.

Caveats: three fit points, min-of-{d.get('runs', '?')}, a shared host —
individual exponents carry real noise on sub-second entries; the value
of this table is the FLAG discipline (no silent super-linear operator)
and the trend, not the third decimal. A healthy distributed
scan/agg/join shows e_diff ≈ 1 (linear once overhead is modeled out);
e_bound > {FLAG_E} means the work grows decisively faster than the
data and needs a reason.

Verdict counts: {json.dumps(counts)}

| query | {sf_cols} | e_raw | e_diff | e_bound | verdict | justification |
|---|{"---|" * len(all_sfs)}---|---|---|---|---|
""")
        for name, disp, e_raw, e_diff, e_bound, verdict, why in rows:
            def s(sf):
                t = disp.get(sf)
                return "-" if t is None or t <= 0 else f"{t:.2f}"
            def e(x):
                return "—" if x is None else f"{x:.2f}"
            tcols = " | ".join(s(sf) for sf in all_sfs)
            f.write(f"| {name} | {tcols} | "
                    f"{e(e_raw)} | {e(e_diff)} | {e(e_bound)} | {verdict} | {why} |\n")
    print(f"wrote {out_path}: {json.dumps(counts)}")
    if unjustified:
        print("UNJUSTIFIED SUPER-LINEAR / FAILED entries:")
        for n in unjustified:
            print(f"  {n}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
