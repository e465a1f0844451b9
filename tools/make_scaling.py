#!/usr/bin/env python3
"""Build the registry-wide decade-scaling table from two bench sweeps.

Usage:
    python3 tools/make_scaling.py SF01.json SF1.json OUT.json [--factor 10]
        [--merge-small=FILE ...] [--merge-big=FILE ...]
        [--caveats=tools/scaling_caveats.json]

For every query present in both sweeps: t_small, t_big, ratio, and the
scaling exponent log(ratio)/log(factor). exponent < 1.0 = sublinear per
decade (the scale gate); >= 1.0 entries are listed first in the output
and summarized on stdout so a caveat can be written per exception.

--merge-small/--merge-big fold extra sweep files (standalone
adjudication re-runs of flagged queries) into the same best-of-N min the
in-sweep repeats already use — the Bench outlier discipline: a full
sweep's one-shot numbers carry up to ~10x run-order noise for
individual queries, and the best across all committed runs is the
methodology's headline. --caveats moves still-superlinear queries with
a documented by-design reason (e.g. an exact all-pairs baseline) from
`superlinear` to `annotated`, carrying the caveat text into the table;
anything left in `superlinear` is an unexplained finding.

Sub-second small-SF times are noise-dominated (JVM/startup constants
swamp the data-dependent part), so the table also records
`noise_floor`: true when t_small < 0.5 s — for those, ratio is mostly
constant-cost amortization and the exponent is not a scaling signal
unless t_big is ALSO large.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    times = dict(d.get("queries", {}))
    for q, rs in (d.get("repeats") or {}).items():
        if rs:
            times[q] = min(min(rs), times.get(q, float("inf")))
    errored = {str(e).split(":")[0] for e in (d.get("errors") or [])}
    # an errored query's recorded duration is a crash time, not a
    # measurement — it must never become a best-of (Bench's own rule;
    # the r16 c25 sf1 crash read as a 2x speedup through the merge path
    # before this drop)
    for q in errored:
        times.pop(q, None)
    return times, errored, d


def merge(times, path):
    extra, _, _ = load(path)
    for q, t in extra.items():
        times[q] = min(t, times.get(q, float("inf")))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = 10.0
    merges_s, merges_b, caveats = [], [], {}
    for a in sys.argv[1:]:
        if a.startswith("--factor"):
            factor = float(a.split("=", 1)[1])
        elif a.startswith("--merge-small="):
            merges_s.append(a.split("=", 1)[1])
        elif a.startswith("--merge-big="):
            merges_b.append(a.split("=", 1)[1])
        elif a.startswith("--caveats="):
            with open(a.split("=", 1)[1]) as f:
                caveats = {k: v for k, v in json.load(f).items()
                           if not k.startswith("_")}
    small_p, big_p, out_p = args
    small, err_s, meta_s = load(small_p)
    big, err_b, meta_b = load(big_p)
    for p in merges_s:
        merge(small, p)
    for p in merges_b:
        merge(big, p)
    rows = {}
    # iterate the UNION incl. errored names: a query that crashed and was
    # never cleanly re-run must appear as a visible error row (the
    # errored-times drop in load() would otherwise make it vanish from
    # the table and read as full coverage); a query whose crash WAS
    # adjudicated by a clean --merge leg has a valid time by now and
    # prices normally
    for q in sorted(set(small) | set(big) | err_s | err_b):
        if q not in small or q not in big:
            if q in err_s or q in err_b:
                side = ("both" if q not in small and q not in big
                        else "small" if q not in small else "big")
                rows[q] = {"error": True, "error_side": side}
            # else: present in only one sweep (registry drift) — skip
            continue
        ts, tb = small[q], big[q]
        ratio = tb / ts if ts > 0 else float("inf")
        exp = math.log(ratio) / math.log(factor) if ratio > 0 else None
        rows[q] = {
            "t_small": round(ts, 3), "t_big": round(tb, 3),
            "ratio": round(ratio, 3), "exponent": round(exp, 3),
            "noise_floor": ts < 0.5,
        }
    flagged = {q: r for q, r in rows.items()
               if not r.get("error") and r["exponent"] >= 1.0
               and not (r["noise_floor"] and r["t_big"] < 2.0)}
    annotated = {q: caveats[q] for q in flagged if q in caveats}
    flagged = {q: r for q, r in flagged.items() if q not in annotated}
    out = {
        "factor": factor,
        "small_sf": meta_s.get("sf"), "big_sf": meta_b.get("sf"),
        "load_small": [meta_s.get("load_avg_before"), meta_s.get("load_avg_after")],
        "load_big": [meta_b.get("load_avg_before"), meta_b.get("load_avg_after")],
        "merged_small": merges_s, "merged_big": merges_b,
        "n_queries": len(rows),
        "n_errors": sum(1 for r in rows.values() if r.get("error")),
        "errors": sorted(q for q, r in rows.items() if r.get("error")),
        "n_superlinear": len(flagged),
        "superlinear": sorted(flagged),
        "annotated": annotated,
        "queries": rows,
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{out_p}: {len(rows)} queries, "
          f"{out['n_errors']} unadjudicated errors: {out['errors']}, "
          f"{len(flagged)} superlinear-and-material: {sorted(flagged)}")
    for q in sorted(flagged):
        r = rows[q]
        print(f"  {q}: {r['t_small']}s -> {r['t_big']}s "
              f"(x{r['ratio']}, exp {r['exponent']})")


if __name__ == "__main__":
    main()
