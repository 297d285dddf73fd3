#!/usr/bin/env python3
"""Dev-only audit: catch oracle-vs-Spark pandas-dtype drift catalog-wide.

The round-5 'unreproducible' driver hash-fails (sequence_packing,
quantile_normalize) were DuckDB HUGEINT columns — SUM(BIGINT) in a window
returns HUGEINT, and pandas renders HUGEINT as float64 ("123.0") while the
Spark parquet column is int64 ("123"). A hash over canonical strings then
mismatches even though every value is numerically equal (which is why
tools/check.py's numeric compare stayed green). This script runs every
oracle SQL and compares its pandas dtypes against the Spark parquet's
pandas dtypes; any mismatch is a latent driver-hash red.

Usage: python3 tools/dtype_audit.py <sfDir> <verifyOutDir>
"""
import json, sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql).df()
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 100").df()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        dd = {c: str(t) for c, t in duck.dtypes.items()}
        sd = {c: str(t) for c, t in spark.dtypes.items()}
        diffs = [(c, sd.get(c), dd.get(c)) for c in sorted(set(dd) | set(sd))
                 if sd.get(c) != dd.get(c)]
        if diffs:
            n_bad += 1
            for c, s, d in diffs:
                print(f"DTYPE {name}.{c}: spark={s} oracle={d}")
    print(f"== {len(oracle) - n_bad} clean, {n_bad} with dtype drift ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
