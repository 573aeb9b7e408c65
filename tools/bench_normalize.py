#!/usr/bin/env python3
"""Host-normalized round-over-round bench comparison (r18, VERDICT r17 #2).

The bench host has a documented bimodal stall distribution: identical
binaries swing 1.1-1.35x across sessions with no code change (r16 verdict
accepted a same-binary A/B proving exactly this; r17 closed without a quiet
pair after three attempts in the band). When a quiet pair (q1 median
<= ~0.30 s AND common-set ratio <= ~1.05x) cannot be recorded, this view is
the pinned comparator: every per-gate time is divided by the artifact's own
interleaved q1_agg median (the host-speed reference sampled in the SAME
session), so a uniform host slowdown cancels and only genuine per-gate
regressions remain.

Usage: bench_normalize.py CUR.json BASE.json [BASE2.json]
Prints a JSON summary: raw and q1-normalized common-set ratios, the
per-gate normalized-ratio median, and the gates whose normalized ratio
exceeds 1.5x (the code-regression candidates worth reading past the band).
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q1med = d["repeats"]["q1_agg"]["median"]
    return d["queries"], q1med


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    cur, cq1 = load(argv[1])
    bases = [load(p) for p in argv[2:]]
    # average the base pair per gate (both runs were accepted as quiet)
    base = {}
    for q in bases[0][0]:
        vals = [b[0][q] for b in bases if q in b[0]]
        if vals:
            base[q] = sum(vals) / len(vals)
    bq1 = sum(b[1] for b in bases) / len(bases)
    common = sorted(set(cur) & set(base))
    craw = sum(cur[q] for q in common)
    braw = sum(base[q] for q in common)
    # normalized per-gate ratios over gates big enough to measure (>1 s in
    # the base: sub-second gates are job-floor noise either side)
    norm = {
        q: (cur[q] / cq1) / (base[q] / bq1)
        for q in common
        if base[q] > 1.0
    }
    med = statistics.median(norm.values()) if norm else float("nan")
    suspects = {
        q: round(r, 3) for q, r in sorted(norm.items(), key=lambda kv: -kv[1])
        if r > 1.5
    }
    out = {
        "common_gates": len(common),
        "raw_common_total_cur": round(craw, 1),
        "raw_common_total_base": round(braw, 1),
        "raw_ratio": round(craw / braw, 3),
        "q1_median_cur": cq1,
        "q1_median_base": round(bq1, 4),
        "normalized_ratio": round((craw / cq1) / (braw / bq1), 3),
        "per_gate_normalized_median": round(med, 3),
        "gates_over_1p5x_normalized": suspects,
        "new_gates_total_sec": round(
            sum(v for k, v in cur.items() if k not in base), 1),
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
