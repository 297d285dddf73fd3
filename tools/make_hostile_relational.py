#!/usr/bin/env python3
"""Dev-only fixture generator: relational tables (lineitem/orders/customer/
supplier/part) whose rows are hostile to the TPC-H/graph query family. The
synthetic sf tables have dense referential integrity (every FK resolves, no
NULL keys, no empty groups, no predicate-edge dates, no half-cent prices,
no rank ties), so the DuckDB oracle can never exercise the cross-engine
divergence classes there: NULL join/order keys (Spark ASC = NULLS FIRST,
DuckDB ASC = NULLS LAST), NOT IN over a list containing NULL, empty
aggregation groups, duplicate-key join fan-out, exact predicate-boundary
dates/quantities/discounts (q1/q3/q6/q14/q17/q19 edges), negative and zero
quantities/prices, empty-string group keys, and window-order ties.

Writes:
  fixtures/hostile_relational/{lineitem,orders,customer,supplier,part,
                               nation,region}.parquet   (committed;
                               HostileRelationalSpec input)
  /tmp/hostile_relational_full/*.parquet  (hostile tables + the remaining
                               tables copied from sf0.001, for Verify +
                               check.py full-catalog sweeps)
"""
import os, shutil, sys
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
REPO_OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                        "hostile_relational")
FULL_OUT = "/tmp/hostile_relational_full"


def d(s):  # date string -> µs timestamp
    import datetime
    return int(datetime.datetime.fromisoformat(s + "+00:00").timestamp()) * 1_000_000


# --- customer: (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment) ---
CUSTOMER = [
    # normal-ish anchor: owns the boundary orders below
    (9000, "Hostile Anchor",        0,    123.125, "BUILDING"),
    # customer with ZERO orders (q13 zero group, q22, anti-join hit)
    (9001, "Hostile NoOrders",      1,    -10.375, "BUILDING"),
    # dangling nationkey (no nation row 99): dim join must drop / null-pad
    (9002, "Hostile DanglingNat",   99,   0.0,     "MACHINERY"),
    # NULL nationkey: NULL join key never matches in either engine
    (9003, "Hostile NullNation",    None, 55.5,    "AUTOMOBILE"),
    # empty name + acctbal TIE with 9000 (rank/order ties)
    (9004, "",                      2,    123.125, "HOUSEHOLD"),
    # empty-string mktsegment: a group key that is "" not NULL
    (9005, "Hostile EmptySeg",      3,    77.0,    ""),
    # NULL mktsegment: Spark ASC=NULLS FIRST vs DuckDB ASC=NULLS LAST
    (9006, "Hostile NullSeg",       4,    88.25,   None),
]

# --- orders: (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
#              o_orderdate_us, o_orderpriority) ---
ORDERS = [
    # boundary o_orderdate exactly on >= edges; half-cent totalprice
    (900000, 9000,   "O", 100.125, d("1997-01-01"), "1-URGENT"),
    # totalprice TIE with 900000 for the same customer (window top-k ties)
    (900001, 9000,   "F", 100.125, d("1997-12-31"), "5-LOW"),
    # EMPTY order (zero lineitems) on an excluded < boundary
    (900002, 9000,   "O", 200.0,   d("1998-01-01"), "2-HIGH"),
    # dangling custkey (no customer 999999): customer join drops it
    (900003, 999999, "O", 300.0,   d("1998-03-15"), "3-MEDIUM"),
    # NULL custkey
    (900004, None,   "P", 400.0,   d("1996-01-01"), "4-NOT SPECIFIED"),
    # status 'P' + q8-window boundary date
    (900005, 9002,   "P", 50.0,    d("1997-07-01"), "2-HIGH"),
    # empty-string status AND priority; zero totalprice; far-future date
    (900006, 9004,   "",  0.0,     d("1999-01-01"), ""),
    # negative totalprice, empty order, q14-month boundary
    (900007, 9002,   "F", -25.5,   d("1997-06-01"), "5-LOW"),
]

# --- lineitem: (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
#                l_extendedprice, l_discount, l_tax, l_returnflag,
#                l_linestatus, l_shipdate_us) ---
LINEITEM = [
    # same (partkey, suppkey) repeated -> join fan-out; q6 edges:
    # quantity exactly 24 (excluded by < 24), discount exactly 0.05/0.07
    # (both inclusive), shipdate exactly on the >= / < year bounds
    (900000, 9000, 900, 1, 24.0,   1000.0,  0.05,      0.0,  "A", "F", d("1997-01-01")),
    (900000, 9000, 900, 2, 23.5,   500.125, 0.07,      0.01, "N", "O", d("1997-12-31") + 86399999999),
    (900000, 9000, 900, 3, 10.0,   250.0,   0.0699999, 0.02, "R", "F", d("1998-01-01")),
    # q1 cutoff: exactly 1998-09-01 00:00:00 (included by <=) and +1µs
    # (excluded); quantity exactly 49.0 (the >= 49 heavy-part edge)
    (900000, 9001, 901, 4, 49.0,   100.0,   0.04,      0.0,  "A", "O", d("1998-09-01")),
    (900000, 9001, 901, 5, 48.999, 100.0,   0.08,      0.0,  "A", "O", d("1998-09-01") + 1),
    # dangling orderkey (no order 999888): order joins drop it
    (999888, 9002, 900, 1, 5.0,    75.25,   0.05,      0.0,  "N", "O", d("1997-03-01")),
    # NULL orderkey: NULL never equi-joins; windows ordered by
    # (l_orderkey, ...) sort it FIRST in Spark, LAST in DuckDB
    (None,   9002, 901, 1, 7.0,    80.0,    0.02,      0.0,  "N", "F", d("1997-04-01")),
    # NULL partkey with quantity >= 49: poisons the NOT IN subquery list
    # (x NOT IN (..., NULL) is never TRUE -> empty result in BOTH engines)
    (900001, None, 902, 1, 50.0,   60.0,    0.03,      0.0,  "R", "O", d("1997-05-01")),
    # NULL suppkey
    (900001, 9000, None, 2, 3.0,   90.5,    0.06,      0.05, "A", "F", d("1997-08-01")),
    # negative and zero quantity/price
    (900003, 9002, 902, 1, -5.0,   -100.0,  0.0,       0.0,  "R", "F", d("1997-09-01")),
    (900003, 9002, 902, 2, 0.0,    0.0,     0.1,       0.08, "N", "O", d("1997-09-02")),
    # empty-string returnflag/linestatus: q1 gets "" groups
    (900004, 9003, 903, 1, 15.0,   45.125,  0.05,      0.02, "",  "",  d("1997-10-01")),
    # q19 quantity/size edges: qty exactly at the between bounds, parts
    # sized exactly at the brand bounds (9004/9005/9006 below)
    (900005, 9004, 900, 1, 1.0,    10.0,    0.01,      0.0,  "N", "O", d("1997-11-01")),
    (900005, 9004, 900, 2, 15.0,   10.0,    0.01,      0.0,  "N", "O", d("1997-11-02")),
    (900005, 9005, 901, 3, 25.0,   20.0,    0.02,      0.0,  "N", "O", d("1997-11-03")),
    (900005, 9006, 902, 4, 35.0,   30.0,    0.03,      0.0,  "N", "O", d("1997-11-04")),
    # identical (quantity, shipdate) within one supplier: windows ordered
    # by ship order alone tie here; rank-by-quantity ties too
    (900006, 9003, 903, 1, 7.0,    10.0,    0.0,       0.0,  "A", "F", d("1997-12-01")),
    (900006, 9003, 903, 2, 7.0,    10.0,    0.0,       0.0,  "A", "F", d("1997-12-01")),
]

# --- supplier: (s_suppkey, s_name, s_nationkey, s_acctbal) ---
SUPPLIER = [
    (900, "Hostile Supp A",   0,    10.125),
    # dangling nationkey + acctbal tie with 900
    (901, "Hostile Supp B",   99,   10.125),
    # empty name, NULL nationkey, negative balance
    (902, "",                 None, -5.0),
    (903, "Hostile Supp D",   1,    0.0),
    # supplier with ZERO lineitems (empty group / left-join null side)
    (904, "Hostile NoLines",  2,    33.333),
]

# --- part: (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice) ---
PART = [
    # PROMO part at half-cent retail price (q14 numerator rows)
    (9000, "hostile promo",     "Brand#1", "PROMO",    10,   1.125),
    # Brand#2 MEDIUM: the q17 target family
    (9001, "hostile medium",    "Brand#2", "MEDIUM",   20,   2.5),
    # zero retail price
    (9002, "hostile zeroprice", "Brand#3", "STANDARD", 30,   0.0),
    # empty name + NULL size (size predicates must not abort)
    (9003, "",                  "Brand#1", "ECONOMY",  None, 5.5),
    # q19 size bounds: exactly 1 / 20 / 30 for Brand#1/2/3
    (9004, "hostile q19 b1",    "Brand#1", "SMALL",    1,    10.0),
    (9005, "hostile q19 b2",    "Brand#2", "MEDIUM",   20,   15.0),
    (9006, "hostile q19 b3",    "Brand#3", "LARGE",    30,   20.0),
    # part NEVER ordered (q16 / NOT IN candidate)
    (9007, "hostile unordered", "Brand#9", "LARGE",    50,   99.99),
]


def build(name, cols, rows, schema):
    arrays = {c: pa.array([r[i] for r in rows], schema[c])
              for i, c in enumerate(cols)}
    return pa.table(arrays)


def main():
    tables = {}
    specs = {
        "customer": (CUSTOMER,
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
            {"c_custkey": pa.int64(), "c_name": pa.string(),
             "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
             "c_mktsegment": pa.string()}),
        "orders": (ORDERS,
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
            {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
             "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
             "o_orderdate": pa.timestamp("us"), "o_orderpriority": pa.string()}),
        "lineitem": (LINEITEM,
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
            {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
             "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
             "l_quantity": pa.float64(), "l_extendedprice": pa.float64(),
             "l_discount": pa.float64(), "l_tax": pa.float64(),
             "l_returnflag": pa.string(), "l_linestatus": pa.string(),
             "l_shipdate": pa.timestamp("us")}),
        "supplier": (SUPPLIER,
            ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
            {"s_suppkey": pa.int64(), "s_name": pa.string(),
             "s_nationkey": pa.int32(), "s_acctbal": pa.float64()}),
        "part": (PART,
            ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
            {"p_partkey": pa.int64(), "p_name": pa.string(),
             "p_brand": pa.string(), "p_type": pa.string(),
             "p_size": pa.int32(), "p_retailprice": pa.float64()}),
    }
    for t, (rows, cols, schema) in specs.items():
        base = pq.read_table(f"{SF}/{t}.parquet")
        hostile = build(t, cols, rows, schema)
        # keep the real table underneath so every query still has signal mass
        tables[t] = pa.concat_tables(
            [base.select(cols), hostile.cast(base.select(cols).schema)])

    os.makedirs(REPO_OUT, exist_ok=True)
    os.makedirs(FULL_OUT, exist_ok=True)
    for t, tab in tables.items():
        pq.write_table(tab, f"{REPO_OUT}/{t}.parquet")
        pq.write_table(tab, f"{FULL_OUT}/{t}.parquet")
    # dims the relational family joins (tiny, copied unmodified) land in the
    # COMMITTED fixture dir; non-relational tables only in the full sweep dir
    for t in ["nation", "region"]:
        for out in [REPO_OUT, FULL_OUT]:
            shutil.copyfile(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")
    for t in ["events", "documents", "embeddings"]:
        shutil.copyfile(f"{SF}/{t}.parquet", f"{FULL_OUT}/{t}.parquet")
    n = {t: tables[t].num_rows for t in tables}
    print(f"wrote hostile relational fixture {n} to {REPO_OUT}; "
          f"full table set to {FULL_OUT}")


if __name__ == "__main__":
    sys.exit(main())
