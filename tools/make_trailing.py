#!/usr/bin/env python3
"""Build tools/bench_trailing.json — the per-query trailing median of
best-of times across committed sweeps (bench_archive format).

The trailing file is the reference graft.Bench's load adjudication
re-runs against: a query whose best-of exceeds 2x its trailing median
mid-sweep gets extra repeats before the JSON is written, so one loaded
minute can't masquerade as a plan regression in the round artifact
(the r10 d21/d20/q31 incident).

Usage:
    python3 tools/make_trailing.py bench_archive/r10_close*.json
Writes tools/bench_trailing.json (sorted keys, 3 decimals).
"""
import json
import statistics
import sys


def main():
    paths = sys.argv[1:]
    if not paths:
        sys.exit("usage: make_trailing.py SWEEP.json [SWEEP.json ...]")
    series = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        times = dict(d.get("queries", {}))
        for q, rs in (d.get("repeats") or {}).items():
            if rs:
                times[q] = min(min(rs), times.get(q, float("inf")))
        errored = {str(e).split(":")[0] for e in (d.get("errors") or [])}
        for q, t in times.items():
            if q not in errored:
                series.setdefault(q, []).append(t)
    trailing = {q: round(statistics.median(ts), 3)
                for q, ts in sorted(series.items())}
    out = "tools/bench_trailing.json"
    with open(out, "w") as f:
        json.dump(trailing, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"{out}: {len(trailing)} queries from {len(paths)} sweeps")


if __name__ == "__main__":
    main()
