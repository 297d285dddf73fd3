#!/usr/bin/env python3
"""Dev-only fixture generator: an `embeddings` table with rows hostile to
the similarity/ANN family. The synthetic table is unit-scale with NO
zero-norm vectors, no exact duplicates, no axis vectors and no
out-of-unit-scale magnitudes at any SF (verified by probe), so the DuckDB
oracle can never exercise the zero-norm-cosine, tie-break or quantization
edge cases there. NaN/±Inf-free on purpose (finite-double domain, as with
hostile_events).

Magnitude envelope: the dot kernel quantizes per-element PRODUCTS at
round(a*b*1e16), so a self-dot needs x^2*1e16 <= 9.2e18 per element
(|x| <= ~30) and dim*x^2*1e16 <= 9.2e18 for a uniform fill (|x| <= ~3.8
at dim 64). The "large" rows here use a +/-2.0 fill and a single
25.0 axis — hostile but inside the documented unit-scale-ish domain;
anything bigger overflows int64 LOUDLY in both engines (tested).

Writes:
  fixtures/hostile_embeddings/embeddings.parquet  (committed;
                                                   HostileEmbeddingsSpec)
  /tmp/hostile_embeddings_full/*.parquet          (hostile embeddings + the
                                                   other 9 tables from
                                                   sf0.001, for Verify +
                                                   check.py)
"""
import os, shutil, sys
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
REPO_OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                        "hostile_embeddings")
FULL_OUT = "/tmp/hostile_embeddings_full"
DIM = 64


def vec(fill=0.0, **at):
    v = [fill] * DIM
    for i, x in at.items():
        v[int(i[1:])] = x
    return v


# (embedding, label) — vec_id derived; labels reuse the 0-9 range plus one
# unseen label (99) for the classifier/centroid paths
HOSTILE = [
    # all-zero vector: norm 0 — cosine must be NULL/absent, never a crash
    (vec(), 0),
    # two of them: a zero-zero pair exercises both sides zero
    (vec(), 1),
    # exact duplicates of each other (cosine exactly 1; top-k tie)
    (vec(0.1), 2),
    (vec(0.1), 2),
    # exact opposite (cosine exactly -1 against the 0.1-fill pair)
    (vec(-0.1), 3),
    # single-axis vectors: orthogonal pair (cosine exactly 0)
    (vec(x0=1.0), 4),
    (vec(x1=1.0), 4),
    # near-zero components: round(x*1e6) quantizes 4e-7 to 0 — the vector
    # quantizes to zero-norm even though its float norm is positive
    (vec(4e-7), 5),
    # large-but-in-envelope magnitude (+/-2.0 uniform fill)
    (vec(2.0), 6),
    (vec(-2.0), 6),
    # mixed extreme: one big axis among unit-scale noise
    (vec(0.01, x32=25.0), 7),
    # tiny norm but nonzero after quantization
    (vec(x5=1e-3), 8),
    # unseen label on an ordinary-looking vector
    (vec(0.05, x7=0.5), 99),
]


def main():
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    base_rows = emb.num_rows
    ids = list(range(base_rows, base_rows + len(HOSTILE)))
    hostile = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v for v, _ in HOSTILE],
                              pa.list_(pa.float32())),
        "label": pa.array([l for _, l in HOSTILE], pa.int32()),
    })
    combined = pa.concat_tables([emb.select(hostile.column_names), hostile])

    os.makedirs(REPO_OUT, exist_ok=True)
    pq.write_table(combined, f"{REPO_OUT}/embeddings.parquet")
    os.makedirs(FULL_OUT, exist_ok=True)
    pq.write_table(combined, f"{FULL_OUT}/embeddings.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        shutil.copyfile(f"{SF}/{t}.parquet", f"{FULL_OUT}/{t}.parquet")
    print(f"wrote {combined.num_rows} embeddings ({len(HOSTILE)} hostile) to "
          f"{REPO_OUT} and full table set to {FULL_OUT}")


if __name__ == "__main__":
    sys.exit(main())
