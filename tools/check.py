#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryName ...]

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over views named
after the testdata tables, sorts columns by name and rows by all columns,
and reports per-query value equality. Optional trailing query names filter
the sweep (the dev loop, and tools/oracle_sweep.py's per-query subprocess
mode). DUCKDB_MEM_CAP caps DuckDB memory (default: DuckDB's own default).
NOT part of the shipped library.

Fast path (round 12): outputs past CHECK_FAST_MIN_ROWS (default 200k)
compare as multisets INSIDE DuckDB — symmetric EXCEPT ALL, vectorized —
instead of the pandas sort + pure-Python cell loop, which at the native-sf1
6M-row window outputs spent ~2 min/query in Python and would be ~20 min at
sf10. Engagement conditions keep "fast OK => slow OK": identical sorted
column names AND identical per-column DuckDB types (no implicit casts, so
no precision-losing coercion can mask a real diff; dtype parity is already
enforced catalog-wide by tools/dtype_audit.py). DuckDB set-op semantics
match cells_equal: NULL groups with NULL, NaN with NaN, -0.0 == 0.0. On a
fast-path mismatch the differing rows are sampled from both EXCEPT
directions for the diagnostic. CHECK_FAST_MIN_ROWS=0 forces the fast path;
setting it huge forces the legacy pandas path.
"""
import json, os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:  # arrays are unhashable/unsortable — use tuples
        if df[c].map(lambda v: hasattr(v, "__len__") and not isinstance(v, str)).any():
            df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__len__")
                              and not isinstance(v, str) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not (hasattr(b, "__len__") and not isinstance(b, str)):
            return False
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    try:
        import pandas as pd
        a_na, b_na = pd.isna(a), pd.isna(b)
        if not hasattr(a_na, "__len__") and not hasattr(b_na, "__len__"):
            if a_na or b_na:
                return bool(a_na) and bool(b_na)
    except Exception:
        pass
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def q(ident):
    return '"' + ident.replace('"', '""') + '"'


def fast_compare(con, name, sql, n_rows):
    """Multiset-compare engine parquet vs oracle SQL inside DuckDB.

    Returns (handled, ok, detail): handled=False -> caller must use the
    pandas path (schema mismatch risk of implicit casts, or describe
    failure). Row counts are compared by the caller beforehand.
    """
    con.execute(f"CREATE OR REPLACE TEMP VIEW __ora AS {sql}")
    eng_desc = con.execute(f"DESCRIBE SELECT * FROM __eng").fetchall()
    ora_desc = con.execute(f"DESCRIBE SELECT * FROM __ora").fetchall()
    eng_t = sorted((r[0], r[1]) for r in eng_desc)
    ora_t = sorted((r[0], r[1]) for r in ora_desc)
    if [c for c, _ in eng_t] != [c for c, _ in ora_t]:
        return True, False, ("columns %s vs %s"
                             % ([c for c, _ in eng_t], [c for c, _ in ora_t]))
    if eng_t != ora_t:
        # same names, different types: implicit casts could hide a real
        # diff (e.g. BIGINT vs DOUBLE) -- use the exact pandas path
        return False, False, None
    cols = ", ".join(q(c) for c, _ in eng_t)
    diff = (f"(SELECT {cols} FROM __eng EXCEPT ALL SELECT {cols} FROM __ora)"
            f" UNION ALL "
            f"(SELECT {cols} FROM __ora EXCEPT ALL SELECT {cols} FROM __eng)")
    n_diff = con.execute(f"SELECT COUNT(*) FROM ({diff})").fetchone()[0]
    if n_diff == 0:
        return True, True, f"({n_rows} rows, fast)"
    samp = con.execute(
        f"SELECT * FROM (SELECT {cols} FROM __eng EXCEPT ALL "
        f"SELECT {cols} FROM __ora) LIMIT 2").fetchall()
    samp2 = con.execute(
        f"SELECT * FROM (SELECT {cols} FROM __ora EXCEPT ALL "
        f"SELECT {cols} FROM __eng) LIMIT 2").fetchall()
    return True, False, (f"{n_diff} differing multiset rows; "
                         f"spark-only={samp!r} duck-only={samp2!r}")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # spill to /tmp with a hard cap: an accidentally-quadratic oracle over a
    # scaled fixture once filled the DISK with 44 GB of spill under the
    # repo's cwd (.tmp/) -- fail the one query loudly instead. Per-pid dir:
    # concurrent check.py processes (tools/oracle_sweep.py) sharing one
    # spill dir delete each other's temp files mid-query (IOException)
    con.execute("SET temp_directory='/tmp/duckdb_spill_%d'" % os.getpid())
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("DUCKDB_TEMP_CAP", "16GiB"))
    for t in TABLES:
        # fixture dirs (e.g. fixtures/hostile) hold a table subset; only
        # register what exists so subset verifies work
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if os.environ.get("DUCKDB_MEM_CAP"):
        con.execute("SET memory_limit='%s'" % os.environ["DUCKDB_MEM_CAP"])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])
    if only:
        missing = only - set(oracle)
        if missing:
            sys.exit(f"unknown queries: {sorted(missing)}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    fast_min = int(os.environ.get("CHECK_FAST_MIN_ROWS", "200000"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            con.execute("CREATE OR REPLACE TEMP VIEW __eng AS "
                        f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            n_eng = con.execute("SELECT COUNT(*) FROM __eng").fetchone()[0]
            if n_eng >= fast_min:
                handled, ok, detail = fast_compare(con, name, sql, n_eng)
                if handled:
                    # fast path checks the multiset directly; equal
                    # multisets imply equal row counts
                    if ok:
                        print(f"OK   {name} {detail}")
                        n_ok += 1
                    else:
                        print(f"FAIL {name}: {detail}")
                        n_bad += 1
                    continue
            spark_df = canon(con.execute("SELECT * FROM __eng").df())
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: read/exec error: {e}")
            n_bad += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_bad += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_bad += 1
            continue
        bad = None
        sv, dv = spark_df.to_numpy().tolist(), duck_df.to_numpy().tolist()
        for i, (r1, r2) in enumerate(zip(sv, dv)):
            for c, (x, y) in enumerate(zip(r1, r2)):
                if not cells_equal(x, y):
                    bad = (i, spark_df.columns[c], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
