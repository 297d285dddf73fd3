#!/usr/bin/env python3
"""Dev-only scale smoke: inflate sf0.1 events 10x (~1M rows) to measure the
COVERAGE.md scale-envelope rows that sf0.1 can only extrapolate (quartic
moments, rank moments, prefix-sum families). Each replica shifts user_id by
replica*10_000 (disjoint user universes -> per-user group sizes stay
realistic while per-type groups grow 10x, which is what stresses the
integer carriers) and event_id by replica*10**12 (uniqueness, keeps window
tie-breaks total). ts/value/event_type/props repeat exactly -- value-domain
compression is preserved, so the compressed-domain operators see 10x rows
over the SAME distinct values, the honest at-scale shape.

Writes /tmp/events_10x/events.parquet + the other 9 tables copied from
sf0.1, for `graft.Verify /tmp/events_10x ...` + tools/check.py.
"""
import os, shutil, sys
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
OUT = "/tmp/events_10x"
REPLICAS = 10


def main():
    ev = pq.read_table(f"{SF}/events.parquet")
    reps = []
    for r in range(REPLICAS):
        t = ev
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pa.compute.add(t.column("user_id"), r * 10_000))
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pa.compute.add(t.column("event_id"), r * 10**12))
        reps.append(t)
    combined = pa.concat_tables(reps)
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(combined, f"{OUT}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copyfile(f"{SF}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"wrote {combined.num_rows} events ({REPLICAS}x sf0.1) to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
