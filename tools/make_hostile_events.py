#!/usr/bin/env python3
"""Dev-only fixture generator: an `events` table whose rows are hostile to
the stats/time-series family. The synthetic table has NO half-cent
boundaries (value*100 exactly n+0.5), no ±0.0, no duplicate (user_id, ts)
collisions, no single-event users and no empty/odd props at any SF
(verified by probe), so the DuckDB oracle can never exercise rounding-,
tie- or null-handling divergence there. NaN/±Inf-free on purpose — the
engine's documented domain is finite doubles; what we chase is the silent
cross-engine divergence class (round-half, -0.0 formatting, unstable window
tie-breaks), not poison values.

Writes:
  fixtures/hostile_events/events.parquet  (committed; HostileEventsSpec input)
  /tmp/hostile_events_full/*.parquet      (hostile events + the other 9
                                           tables copied from sf0.001, for
                                           Verify + check.py)
"""
import json, os, shutil, sys
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
REPO_OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                        "hostile_events")
FULL_OUT = "/tmp/hostile_events_full"

US = 1_000_000  # microseconds per second
BASE = 1735689600 * US  # 2025-01-01 00:00:00 UTC, clear of the real rows

# (ts_offset_us, user_id, event_type, value, props) — event_id derived.
# user ids start at 9000: every hostile user is new, so single-event-user
# shapes stay single-event even on top of the real table.
HOSTILE = [
    # --- exact half-cent boundaries: value*100 is exactly n+0.5 in IEEE
    # double (k/8 family), where HALF_UP vs round-half-to-even diverge ---
    (0,          9000, "purchase", 0.125,   '{"k": 1}'),    # 12.5 cents
    (1 * US,     9000, "purchase", 0.375,   '{"k": 2}'),    # 37.5
    (2 * US,     9000, "purchase", 0.625,   '{"k": 3}'),    # 62.5
    (3 * US,     9000, "purchase", 0.875,   '{"k": 4}'),    # 87.5
    (4 * US,     9000, "purchase", 1.125,   '{"k": 5}'),    # 112.5
    (5 * US,     9001, "error",    -0.125,  '{"k": 6}'),    # -12.5: away-from-zero vs toward-zero
    (6 * US,     9001, "error",    -0.625,  '{"k": 7}'),    # -62.5
    # --- signed zero: sums/avgs/min/max must not leak "-0.0" vs "0.0" ---
    (7 * US,     9002, "click",    -0.0,    '{"k": 8}'),
    (8 * US,     9002, "click",    0.0,     '{"k": 9}'),
    # --- duplicate (user_id, ts): any window ordered by ts alone has a
    # nondeterministic tie here; ordering must include event_id ---
    (9 * US,     9003, "view",     1.0,     '{"k": 10}'),
    (9 * US,     9003, "view",     2.0,     '{"k": 11}'),
    (9 * US,     9003, "click",    3.0,     '{"k": 12}'),
    # --- duplicate ts ACROSS users (global-order ties) ---
    (10 * US,    9004, "view",     4.0,     '{"k": 13}'),
    (10 * US,    9005, "view",     5.0,     '{"k": 14}'),
    # --- single-event users (denominator-1 stats, zero-variance groups) ---
    (11 * US,    9006, "signup",   42.0,    '{"k": 15}'),
    (12 * US,    9007, "signup",   42.0,    '{"k": 16}'),   # same value too
    # --- identical values within a group: rank/dense_rank/percentile ties ---
    (13 * US,    9008, "purchase", 7.0,     '{"k": 17}'),
    (14 * US,    9008, "purchase", 7.0,     '{"k": 18}'),
    (15 * US,    9008, "purchase", 7.0,     '{"k": 19}'),
    # --- classic float-representation trap: 0.1+0.2 style decimals ---
    (16 * US,    9009, "error",    0.30000000000000004, '{"k": 20}'),
    (17 * US,    9009, "error",    0.3,     '{"k": 21}'),
    # --- exact midnight day boundary + one microsecond either side:
    # day-bucketing must put them in different days deterministically ---
    (86400 * US - 1, 9010, "click", 10.0,   '{"k": 22}'),
    (86400 * US,     9010, "click", 11.0,   '{"k": 23}'),
    (86400 * US + 1, 9010, "click", 12.0,   '{"k": 24}'),
    # --- hostile props: empty JSON, missing key, empty string, null,
    # nested object, non-JSON garbage (get_json_object must yield NULL) ---
    (18 * US,    9011, "view",     1.5,     "{}"),
    (19 * US,    9011, "view",     2.5,     '{"other": 3}'),
    (20 * US,    9011, "view",     3.5,     ""),
    (21 * US,    9011, "view",     4.5,     None),
    (22 * US,    9011, "view",     5.5,     '{"k": {"nested": 1}}'),
    (23 * US,    9011, "view",     6.5,     "not json at all"),
    # --- empty-string event type (group key that is "" not NULL) ---
    (24 * US,    9012, "",         9.0,     '{"k": 25}'),
    # --- large-but-in-envelope magnitudes. The binding constraint is the
    # quartic carrier in moments_by_type: exact µ-quantized 4th powers need
    # (within-group spread in µ)⁴ · n ≤ 1.7e38, so a ±500 spread is the
    # documented exact domain at 1e6 rows/group; cents/ppm sums would take
    # ±1e7 easily, but these rows land in every events group ---
    (25 * US,    9013, "purchase", 499.99,  '{"k": 26}'),
    (26 * US,    9013, "purchase", -499.99, '{"k": 27}'),
    # --- typed-vs-coerced k (round 10): non-integer number, numeric string,
    # bool. variant_props_stats (typed probe) must exclude all three;
    # json_props_stats (string coercion) must accept ONLY the integral
    # string "31" — and the DuckDB oracle must not round '5.7' to 6 ---
    (27 * US,    9014, "click",    1.0,     '{"k": 5.7}'),
    (28 * US,    9014, "click",    2.0,     '{"k": "31"}'),
    (29 * US,    9014, "click",    3.0,     '{"k": true}'),
]


def main():
    ev = pq.read_table(f"{SF}/events.parquet")
    base_rows = ev.num_rows
    ids = list(range(base_rows, base_rows + len(HOSTILE)))
    hostile = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([BASE + o for o, _, _, _, _ in HOSTILE],
                       pa.timestamp("us")),
        "user_id": pa.array([u for _, u, _, _, _ in HOSTILE], pa.int64()),
        "event_type": pa.array([t for _, _, t, _, _ in HOSTILE], pa.string()),
        "value": pa.array([v for _, _, _, v, _ in HOSTILE], pa.float64()),
        "props": pa.array([p for _, _, _, _, p in HOSTILE], pa.string()),
    })
    # keep the real table underneath so every query still has signal mass
    combined = pa.concat_tables([ev.select(hostile.column_names), hostile])

    os.makedirs(REPO_OUT, exist_ok=True)
    pq.write_table(combined, f"{REPO_OUT}/events.parquet")
    os.makedirs(FULL_OUT, exist_ok=True)
    pq.write_table(combined, f"{FULL_OUT}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copyfile(f"{SF}/{t}.parquet", f"{FULL_OUT}/{t}.parquet")
    print(f"wrote {combined.num_rows} events ({len(HOSTILE)} hostile) to "
          f"{REPO_OUT} and full table set to {FULL_OUT}")


if __name__ == "__main__":
    sys.exit(main())
