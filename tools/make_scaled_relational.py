#!/usr/bin/env python3
"""Dev-only scale smoke for the RELATIONAL family: inflate sf0.1
lineitem + orders 10x (~6M lineitem rows) so the lineitem/orders
envelope rows in COVERAGE.md are measured, not extrapolated (q1/q18
aggregate carriers, customer_rfm's per-customer groups, the
copurchase-graph builds behind pagerank/kcore/harmonic/link-prediction).

TWO fixtures, because "10x" means different things to different families:

/tmp/relational_10x  (aggregate/join family: q1, q9, q18, rfm, pareto, ...)
- o_orderkey / l_orderkey shift by replica * 10**9 -> the orders><lineitem
  join stays consistent and (l_orderkey, l_linenumber) stays unique.
- o_custkey / l_partkey / l_suppkey repeat exactly -> per-customer and
  per-part group sizes grow 10x over the SAME key universe, which is what
  stresses aggregation carriers; dates/prices/quantities repeat exactly so
  value-domain compression is preserved and q1-style sums grow 10x against
  the cents carriers.

/tmp/graph_10x  (copurchase-graph family: pagerank, kcore, harmonic,
link prediction -- these read ONLY lineitem and use l_partkey as node ids)
- l_orderkey AND l_partkey shift per replica -> 10 DISJOINT copies of the
  sf0.1 copurchase graph: 10x nodes and edges with UNCHANGED local
  structure and support counts. Replicating with the same part keys would
  instead multiply every pair's co-occurrence support by 10, blow every
  pair past the support threshold, and densify the graph quadratically --
  a 44 GB DuckDB spill taught us that is NOT the at-scale shape (real 10x
  data grows the graph, it does not overlay the same orders 10 times).
"""
import os, shutil, sys
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
REPLICAS = 10
KEY_SHIFT = 10**9


def inflate(out, name, key_cols):
    t0 = pq.read_table(f"{SF}/{name}.parquet")
    reps = []
    for r in range(REPLICAS):
        t = t0
        for k in key_cols:
            t = t.set_column(t.schema.get_field_index(k), k,
                             pa.compute.add(t.column(k), r * KEY_SHIFT))
        reps.append(t)
    combined = pa.concat_tables(reps)
    pq.write_table(combined, f"{out}/{name}.parquet")
    print(f"wrote {combined.num_rows} {name} rows ({REPLICAS}x sf0.1) -> {out}")


def copy_rest(out, skip):
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        if t not in skip:
            shutil.copyfile(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")


def main():
    agg = "/tmp/relational_10x"
    os.makedirs(agg, exist_ok=True)
    inflate(agg, "orders", ["o_orderkey"])
    inflate(agg, "lineitem", ["l_orderkey"])
    copy_rest(agg, {"orders", "lineitem"})

    graph = "/tmp/graph_10x"
    os.makedirs(graph, exist_ok=True)
    inflate(graph, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    copy_rest(graph, {"lineitem"})
    print("done")


if __name__ == "__main__":
    sys.exit(main())
