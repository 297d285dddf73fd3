#!/usr/bin/env python3
"""Scale-ratio regression gate: flag queries whose measured cost grows
superlinearly between two bench sweeps at different scale factors.

The strongest scale-design signal the harness produces is the per-query
wall-time ratio between a sweep at SF x and a sweep at 10x (the round-10
pair family measured 20-71x at 10x data while hash-green everywhere --
correct plans that would be days at 100x). This tool turns that audit
into a gate so a newly superlinear query is caught the round it lands.

Usage:
    python3 tools/scale_ratio.py BENCH_small.json BENCH_big.json \
        [--sf-factor 10] [--threshold 15] [--min-small 0.2]

- ratio = big_seconds / small_seconds per query present in both sweeps
- queries with small_seconds < --min-small are reported but not flagged
  (sub-200ms timings are scheduler noise, not measurements)
- exit 1 iff any query with a trustworthy base time exceeds --threshold

Threshold rationale: at --sf-factor 10 a linear query measures ~10x plus
constant-time amortization (usually BELOW 10x); 15x allows log-factor
growth (graph rounds, sort depth) while catching the n^1.5+ shapes the
round-10 audit found at 20x+.
"""
import argparse
import json
import sys


def load_queries(path):
    with open(path) as f:
        data = json.load(f)
    qs = data.get("queries")
    if not isinstance(qs, dict) or not qs:
        sys.exit(f"{path}: no per-query 'queries' map (single-line total? "
                 "re-run Bench with SPARK_GRAFT_BENCH_OUT to capture it)")
    return data, qs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("small", help="bench JSON at the smaller SF")
    ap.add_argument("big", help="bench JSON at the larger SF")
    ap.add_argument("--sf-factor", type=float, default=10.0,
                    help="data-size ratio between the two sweeps")
    ap.add_argument("--threshold", type=float, default=15.0,
                    help="flag ratios above this")
    ap.add_argument("--min-small", type=float, default=0.2,
                    help="ignore queries faster than this at the small SF")
    args = ap.parse_args()

    meta_s, qs_small = load_queries(args.small)
    meta_b, qs_big = load_queries(args.big)
    shared = sorted(set(qs_small) & set(qs_big))
    if not shared:
        sys.exit("no shared queries between the two sweeps")
    missing = sorted(set(qs_small) ^ set(qs_big))
    if missing:
        print(f"note: {len(missing)} queries in only one sweep: "
              f"{', '.join(missing[:8])}{'...' if len(missing) > 8 else ''}")

    flagged, noisy = [], []
    rows = []
    for q in shared:
        s, b = qs_small[q], qs_big[q]
        ratio = b / s if s > 0 else float("inf")
        rows.append((ratio, q, s, b))
        if ratio > args.threshold:
            (noisy if s < args.min_small else flagged).append((ratio, q, s, b))

    rows.sort(reverse=True)
    print(f"{'ratio':>8}  {'small_s':>8}  {'big_s':>8}  query   "
          f"(sf x{args.sf_factor:g}, threshold {args.threshold:g}x)")
    for ratio, q, s, b in rows[:15]:
        mark = " <-- FLAG" if any(q == f[1] for f in flagged) else (
            " (noisy base)" if any(q == f[1] for f in noisy) else "")
        print(f"{ratio:8.1f}  {s:8.2f}  {b:8.2f}  {q}{mark}")

    if flagged:
        print(f"\nFAIL: {len(flagged)} superlinear "
              f"quer{'y' if len(flagged) == 1 else 'ies'} "
              f"(> {args.threshold:g}x at {args.sf_factor:g}x data):")
        for ratio, q, s, b in sorted(flagged, reverse=True):
            print(f"  {q}: {s:.2f}s -> {b:.2f}s ({ratio:.1f}x)")
        sys.exit(1)
    print(f"\nOK: all {len(shared)} shared queries scale <= "
          f"{args.threshold:g}x ({len(noisy)} above threshold on "
          "sub-noise-floor bases, reported only)")


if __name__ == "__main__":
    main()
