#!/usr/bin/env python3
"""Dev-only skew-at-volume benchmark (round-11 verdict #4).

HostileSkewSpec proves the shuffle families stay CORRECT on a tiny hot-key
fixture; nothing measured their COST under skew. This tool builds TWO
sf0.1-volume variants that differ ONLY in key distribution, times the
shuffle-heavy catalog subset on both with graft.Bench, and records the
per-query skew/uniform wall ratio:

  uniform: sf0.1 + 600k extra lineitem rows / 100k extra events whose
           part/supp/user keys are spread uniformly over the existing
           key domains (the volume-matched control — comparing against
           plain sf0.1 would conflate 2x volume with skew).
  skew:    the SAME extra rows, but every one pinned to ONE hot part,
           ONE hot supplier, ONE hot user — the hot key carries ~50% of
           its table, the shape that turns a 1000-executor shuffle into
           a single-straggler stage at 100 TB.

Everything else (row counts, orderkey attachment, values, timestamps) is
identical between the variants, so ratio > 1 isolates key-skew cost.
AQE's skew-join splitting and the catalog's salted/two-phase aggregates
are expected to hold the ratio near 1; per the verdict, anything > 3x is
a defect to fix (salt or AQE-tune), recorded in SKEW_BENCH.json.

Usage: python3 tools/skew_bench.py [--out SKEW_BENCH.json] [--keep]
Writes fixture dirs under /tmp/skewbench/{uniform,skew} (~70 MB, not
committed) and runs sbt twice; ~15 min end to end.
"""
import argparse
import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
ROOT = "/tmp/skewbench"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
US = 1_000_000

N_EXTRA_LI = 600_000
N_EXTRA_EV = 100_000
HOT_USER = 7777_000  # outside the sf0.1 user domain (0..1499)

# shuffle-heavy subset: every query here shuffles on a key the fixture
# skews (user_id / l_suppkey / l_partkey) or aggregates the inflated
# tables end to end
QUERIES = [
    "count_per_key", "session_windows", "session_overlap_pairs",
    "pivot_user_events", "sliding_hour", "tumbling_daily",
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "window_running_supplier", "window_topk_per_customer", "topk_orders",
    "rollup_returns", "customer_rfm", "frequent_triples",
]


def build(variant):
    out = f"{ROOT}/{variant}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(777)  # same stream for both variants

    li = pq.read_table(f"{SF}/lineitem.parquet")
    orders = pq.read_table(f"{SF}/orders.parquet")
    okeys = orders.column("o_orderkey").to_numpy()
    n_part = pq.read_table(f"{SF}/part.parquet").num_rows
    n_supp = pq.read_table(f"{SF}/supplier.parquet").num_rows
    max_ln = pc.max(li.column("l_linenumber")).as_py()
    n = N_EXTRA_LI
    i = np.arange(n)
    # keys: the ONLY difference between variants
    if variant == "skew":
        pk = np.zeros(n, dtype=np.int64)
        sk = np.zeros(n, dtype=np.int64)
    else:
        pk = rng.integers(0, n_part, n)
        sk = rng.integers(0, n_supp, n)
    ship_base = pc.min(li.column("l_shipdate")).cast(pa.int64()).as_py()
    extra_li = pa.table({
        "l_orderkey": pa.array(okeys[i % len(okeys)], pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array((max_ln + 1 + i // len(okeys)).astype(np.int32),
                                 pa.int32()),
        "l_quantity": pa.array((1 + i % 50).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(900.0 + (i % 1000) * 1.01, 2)),
        "l_discount": pa.array(np.round((i % 11) * 0.01, 2)),
        "l_tax": pa.array(np.round((i % 9) * 0.01, 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[i % 3]),
        "l_linestatus": pa.array(np.array(["O", "F"])[i % 2]),
        "l_shipdate": pa.array(ship_base + (i.astype(np.int64) * 2654435761)
                               % (120 * 86400 * US), pa.timestamp("us")),
    }).select(li.column_names).cast(li.schema)
    pq.write_table(pa.concat_tables([li, extra_li]), f"{out}/lineitem.parquet")

    ev = pq.read_table(f"{SF}/events.parquet")
    t0 = pc.min(ev.column("ts")).cast(pa.int64()).as_py()
    t1 = pc.max(ev.column("ts")).cast(pa.int64()).as_py()
    m = N_EXTRA_EV
    j = np.arange(m)
    n_users = 1500
    uid = (np.full(m, HOT_USER, dtype=np.int64) if variant == "skew"
           else rng.integers(0, n_users, m))
    extra_ev = pa.table({
        "event_id": pa.array(ev.num_rows + j, pa.int64()),
        "ts": pa.array(t0 + (j.astype(np.int64) * 2654435761) % (t1 - t0),
                       pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(
            np.array(["view", "click", "purchase", "error", "signup"])[j % 5]),
        "value": pa.array(np.round(1.0 + (j % 97) * 0.75, 2)),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in j % 53]),
    }).select(ev.column_names).cast(ev.schema)
    pq.write_table(pa.concat_tables([ev, extra_ev]), f"{out}/events.parquet")

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "documents", "embeddings"]:
        if not os.path.exists(f"{out}/{t}.parquet"):
            os.link(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"built {out}")
    return out


def bench(sf_dir, tag):
    out = f"{ROOT}/bench_{tag}.json"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_ONLY=",".join(QUERIES),
               SPARK_GRAFT_BENCH_OUT=out)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=REPO, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return json.load(open(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SKEW_BENCH.json"))
    ap.add_argument("--threshold", type=float, default=3.0)
    args = ap.parse_args()

    uni_dir, skew_dir = build("uniform"), build("skew")
    uni = bench(uni_dir, "uniform")
    skew = bench(skew_dir, "skew")
    rows = {}
    worst = 0.0
    for q in QUERIES:
        u, s = uni["queries"].get(q), skew["queries"].get(q)
        if u is None or s is None:
            rows[q] = {"error": "missing timing"}
            continue
        ratio = round(s / u, 2) if u > 0 else None
        rows[q] = {"uniform_sec": round(u, 2), "skew_sec": round(s, 2),
                   "ratio": ratio}
        worst = max(worst, ratio or 0)
    result = {
        "fixture": {"base": SF, "extra_lineitem": N_EXTRA_LI,
                    "extra_events": N_EXTRA_EV,
                    "hot_share": "~50% of each skewed table on one key"},
        "uniform_meta": {k: uni.get(k) for k in
                         ("canary_floor_sec", "stall_retries", "failed")},
        "skew_meta": {k: skew.get(k) for k in
                      ("canary_floor_sec", "stall_retries", "failed")},
        "queries": rows,
        "worst_ratio": worst,
        "threshold": args.threshold,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    for q, r in sorted(rows.items(), key=lambda kv: -(kv[1].get("ratio") or 0)):
        print(q, r)
    print(f"worst ratio {worst} (threshold {args.threshold})")
    sys.exit(0 if worst <= args.threshold else 1)


if __name__ == "__main__":
    main()
