#!/usr/bin/env python3
"""Dev-only fixture generator: a table set whose key distribution is
hostile to every shuffle — ONE hot key carrying ~50% of the rows.

The synthetic tables are near-uniform (sf0.001 probe: max user holds 1.6%
of events, max part 0.9% of lineitem), so no driver-side test ever proves
the catalog's groupBy/window/join shuffles survive the thing that actually
kills them at 100 TB: a hot key. This fixture makes the skew explicit:

  events:   user_id 7777 gets +1000 rows (50% of the combined table),
            spread over the full time range with mixed event types and
            valid scalar props (the POINT is volume, not malformed values
            -- hostile_events owns those).
  lineitem: partkey/suppkey of the FIRST sf0.001 part/supplier get +6000
            rows (50%), attached round-robin to existing orderkeys with
            fresh linenumbers, so order/customer joins still resolve and
            every added row flows through the revenue aggregates.

All other tables are copied verbatim from sf0.001 so any catalog query can
run against the fixture dir. HostileSkewSpec sweeps the groupBy/window/
join families over it and separately asserts AQE skew-join splitting
engages on the hot key once thresholds are scaled down to fixture size.

Writes fixtures/hostile_skew/*.parquet (committed; HostileSkewSpec input).
"""
import datetime
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "hostile_skew")

US = 1_000_000
HOT_USER = 7777
N_HOT_EVENTS = 1000
N_HOT_LINES = 6000
ETYPES = ["view", "click", "purchase", "error", "signup"]


def skew_events():
    ev = pq.read_table(f"{SF}/events.parquet")
    base_rows = ev.num_rows
    ts = ev.column("ts").to_pylist()
    t0, t1 = min(ts), max(ts)
    span = int((t1 - t0).total_seconds() * US) or US
    ids, tss, types, vals, props = [], [], [], [], []
    for i in range(N_HOT_EVENTS):
        ids.append(base_rows + i)
        # deterministic spread over the real time range; never collides
        # with a real (user, ts) because the user is new
        tss.append(t0 + datetime.timedelta(
            microseconds=(i * 2654435761) % span))
        types.append(ETYPES[i % len(ETYPES)])
        vals.append(round(1.0 + (i % 97) * 0.75, 2))
        props.append('{"k": %d}' % (i % 53))
    hot = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(tss, pa.timestamp("us")),
        "user_id": pa.array([HOT_USER] * N_HOT_EVENTS, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    })
    return pa.concat_tables([ev.select(hot.column_names), hot])


def skew_lineitem():
    li = pq.read_table(f"{SF}/lineitem.parquet")
    orders = pq.read_table(f"{SF}/orders.parquet")
    okeys = orders.column("o_orderkey").to_pylist()
    hot_part = pq.read_table(f"{SF}/part.parquet").column("p_partkey")[0].as_py()
    hot_supp = pq.read_table(f"{SF}/supplier.parquet").column("s_suppkey")[0].as_py()
    # max existing linenumber -> fresh linenumbers keep (orderkey, linenumber)
    # unique in the combined table
    max_ln = max(li.column("l_linenumber").to_pylist())
    cols = {name: li.column(name).to_pylist() for name in li.column_names}
    template = {name: cols[name][0] for name in li.column_names}
    rows = {name: [] for name in li.column_names}
    for i in range(N_HOT_LINES):
        r = dict(template)
        r["l_orderkey"] = okeys[i % len(okeys)]
        r["l_partkey"] = hot_part
        r["l_suppkey"] = hot_supp
        r["l_linenumber"] = max_ln + 1 + (i // len(okeys))
        r["l_quantity"] = float(1 + i % 50)
        r["l_extendedprice"] = round(900.0 + (i % 1000) * 1.01, 2)
        r["l_discount"] = round((i % 11) * 0.01, 2)
        r["l_tax"] = round((i % 9) * 0.01, 2)
        for name in li.column_names:
            rows[name].append(r[name])
    hot = pa.table({name: pa.array(rows[name], li.schema.field(name).type)
                    for name in li.column_names})
    return pa.concat_tables([li, hot])


def main():
    os.makedirs(OUT, exist_ok=True)
    ev = skew_events()
    li = skew_lineitem()
    pq.write_table(ev, f"{OUT}/events.parquet")
    pq.write_table(li, f"{OUT}/lineitem.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "documents", "embeddings"]:
        shutil.copyfile(f"{SF}/{t}.parquet", f"{OUT}/{t}.parquet")
    hot_ev = sum(1 for u in ev.column("user_id").to_pylist() if u == HOT_USER)
    print(f"wrote {ev.num_rows} events ({hot_ev} on user {HOT_USER} = "
          f"{100.0 * hot_ev / ev.num_rows:.0f}%), {li.num_rows} lineitem "
          f"to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
