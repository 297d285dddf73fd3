#!/usr/bin/env python3
"""Dev-only forensic diff of two Verify `digests.json` files.

When the driver's CORRECTNESS reports `hash_match: false` for a query, run
graft.Verify locally and diff its digests.json against the driver-side one
(archived next to CORRECTNESS_r{N}.json): a row-count or per-column md5
mismatch names exactly which column's values differ between the two Spark
runs — or proves the Spark outputs are identical and the divergence lives
in the oracle/compare side.

Usage: python3 tools/digestdiff.py <digests_a.json> <digests_b.json> [query]
"""
import json, sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    only = sys.argv[3] if len(sys.argv) > 3 else None
    names = sorted(set(a) | set(b))
    n_diff = 0
    for name in names:
        if only and name != only:
            continue
        if name not in a or name not in b:
            print(f"ONLY-{'B' if name not in a else 'A'} {name}")
            n_diff += 1
            continue
        da, db = a[name], b[name]
        if da == db:
            continue
        n_diff += 1
        if da.get("rows") != db.get("rows"):
            print(f"DIFF {name}: rows {da.get('rows')} vs {db.get('rows')}")
        ca, cb = da.get("cols", {}), db.get("cols", {})
        for c in sorted(set(ca) | set(cb)):
            va, vb = ca.get(c), cb.get(c)
            if va != vb:
                print(f"DIFF {name}.{c}: {va} vs {vb}")
    print(f"== {n_diff} differing quer{'y' if n_diff == 1 else 'ies'} ==")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
