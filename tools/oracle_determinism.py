#!/usr/bin/env python3
"""Dev-only sweep: is every oracle SQL deterministic across DuckDB runs?

Motivation (round 7): `dup_span_coverage`'s first oracle draft used a ROWS
window frame ordered by non-unique (lo, hi) keys; DuckDB's parallel window
evaluation made the island assignment flip between runs — the driver's
CORRECTNESS check would have flaked red on a correct engine output. Exact
duplicate sort keys under a ROWS frame are underdetermined SQL in ANY
engine; this sweep catches the class empirically by running every oracle
K times in fresh connections (thread counts varied to provoke parallel
plans) and diffing the sorted result multisets.

Usage: python3 tools/oracle_determinism.py <sfDir> <verifyOutDir> [K=5]

NOT part of the shipped library.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def run_once(sf_dir, sql, threads):
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        rows = con.execute(sql).fetchall()
    finally:
        con.close()

    def canon(v):
        return tuple(canon(x) for x in v) if isinstance(v, list) else v
    # None-safe total order (cube/rollup rows carry NULL grouping cells);
    # string keys only ORDER the rows — equality below is on real values
    return sorted((tuple(canon(c) for c in r) for r in rows),
                  key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    flaky, errs = [], []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ref = run_once(sf_dir, sql, 8)
            for i in range(1, k):
                # alternate thread counts: single-threaded vs parallel
                # window/agg plans is exactly where tie-order leaks show
                got = run_once(sf_dir, sql, 1 if i % 2 else 8)
                if got != ref:
                    ndiff = sum(1 for a, b in zip(ref, got) if a != b) \
                        + abs(len(ref) - len(got))
                    print(f"FLAKY {name}: run {i} differs ({ndiff} rows)")
                    flaky.append(name)
                    break
            else:
                print(f"ok    {name}")
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"ERR   {name}: {e}")
            errs.append(name)
    print(f"== {len(oracle) - len(flaky) - len(errs)} deterministic, "
          f"{len(flaky)} flaky, {len(errs)} err ==")
    sys.exit(1 if flaky or errs else 0)


if __name__ == "__main__":
    main()
