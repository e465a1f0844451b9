#!/usr/bin/env python3
"""Compare two bench sweep JSONs (graft.Bench / bench_archive format).

Makes the load-phase adjudication rounds 7-9 did by hand mechanical:
per-query best-time ratios on the SHARED query set, load_avg context for
both runs, median/decile summary, >2x flags, errored-query exclusion.

Usage:
    python3 tools/bench_compare.py BASE.json NEW.json [--gate 2.0] [--md]

Exit code 1 if any shared query exceeds the gate ratio (new/base), so the
comparison can sit in a round checklist as a command, not a judgment call.

Interpretation guide (from rounds 7-9): a load-correlated elevation is
UNIFORM across pure-scan and shuffle-heavy queries alike; a plan
regression is concentrated. The report prints the uniformity signal
(ratio IQR and the scan-only median vs overall median) so the reader can
tell the two apart at a glance.
"""

import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # best-of times: prefer per-query minima over 'repeats'; 'queries'
    # already holds the best-of value in this repo's sweeps.
    times = dict(d.get("queries", {}))
    reps = d.get("repeats") or {}
    for q, rs in reps.items():
        if rs:
            times[q] = min(min(rs), times.get(q, float("inf")))
    errored = set()
    for e in d.get("errors") or []:
        errored.add(e.get("query") if isinstance(e, dict) else str(e).split(":")[0])
    meta = {
        "total": d.get("value"),
        "sf": d.get("sf"),
        "load_before": d.get("load_avg_before"),
        "load_after": d.get("load_avg_after"),
        "n": len(times),
        "errors": sorted(errored),
    }
    return times, meta


def quantile(xs, q):
    xs = sorted(xs)
    if not xs:
        return float("nan")
    i = q * (len(xs) - 1)
    lo, hi = int(i), min(int(i) + 1, len(xs) - 1)
    return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--gate", type=float, default=2.0,
                    help="fail if any shared query's new/base ratio exceeds this")
    ap.add_argument("--md", action="store_true", help="emit a markdown section")
    args = ap.parse_args()

    bt, bm = load(args.base)
    nt, nm = load(args.new)
    excluded = set(bm["errors"]) | set(nm["errors"])
    shared = sorted((set(bt) & set(nt)) - excluded)
    only_base = sorted(set(bt) - set(nt) - excluded)
    only_new = sorted(set(nt) - set(bt) - excluded)

    rows = [(q, bt[q], nt[q], nt[q] / bt[q] if bt[q] > 0 else float("inf"))
            for q in shared]
    ratios = [r for _, _, _, r in rows]
    med = statistics.median(ratios) if ratios else float("nan")
    flags = [(q, b, n, r) for q, b, n, r in rows if r > args.gate]

    # uniformity signal: load elevation moves scans and shuffles alike
    scanlike = [r for q, _, _, r in rows
                if q.split("_")[0] in {"q05", "q14", "q16", "q17", "t01", "t06", "c06", "c09"}
                or q.startswith(("t0", "m0", "c0"))]
    scan_med = statistics.median(scanlike) if scanlike else float("nan")

    def line(s=""):
        print(s)

    hdr = "##" if args.md else "=="
    line(f"{hdr} bench_compare: {args.base} -> {args.new}")
    line(f"base: n={bm['n']} total={bm['total']}s sf={bm['sf']} "
         f"load={bm['load_before']}->{bm['load_after']} errors={bm['errors'] or 'none'}")
    line(f"new:  n={nm['n']} total={nm['total']}s sf={nm['sf']} "
         f"load={nm['load_before']}->{nm['load_after']} errors={nm['errors'] or 'none'}")
    line(f"shared={len(shared)} only_base={only_base or 'none'} only_new={only_new or 'none'}")
    line()
    line(f"ratio (new/base) over shared queries:")
    line(f"  median={med:.3f}  p10={quantile(ratios, .1):.3f}  p90={quantile(ratios, .9):.3f}  "
         f"min={min(ratios):.3f}  max={max(ratios):.3f}")
    line(f"  sum: {sum(bt[q] for q in shared):.1f}s -> {sum(nt[q] for q in shared):.1f}s")
    line(f"  uniformity: scan-ish median={scan_med:.3f} vs overall {med:.3f} "
         f"({'uniform -> suspect load, not plans' if abs(scan_med - med) < 0.25 * max(med, 1e-9) else 'CONCENTRATED -> inspect flagged plans'})")
    line()
    if flags:
        line(f"queries over the {args.gate}x gate:")
        for q, b, n, r in sorted(flags, key=lambda x: -x[3]):
            line(f"  {q}: {b:.3f}s -> {n:.3f}s ({r:.2f}x)")
    else:
        line(f"no query over the {args.gate}x gate")
    line()
    worst = sorted(rows, key=lambda x: -x[3])[:8]
    best = sorted(rows, key=lambda x: x[3])[:5]
    line("worst 8:")
    for q, b, n, r in worst:
        line(f"  {q}: {b:.3f} -> {n:.3f} ({r:.2f}x)")
    line("best 5:")
    for q, b, n, r in best:
        line(f"  {q}: {b:.3f} -> {n:.3f} ({r:.2f}x)")

    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
