#!/usr/bin/env python3
"""Dev-only fixture generator: a `documents` table whose text column is
hostile to tokenization (leading/trailing/double spaces, empty strings,
whitespace-only, 1- and 2-token docs, tabs/newlines, unicode). The synthetic
corpus has NONE of these shapes at any SF, so the DuckDB oracle could never
catch a Spark-vs-DuckDB `split` divergence on them (the `sequence(1,0)`
class proved the risk is real).

Writes:
  fixtures/hostile/documents.parquet   (committed; HostileTextSpec input)
  /tmp/hostile_full/*.parquet          (full table set: hostile documents +
                                        the other 9 tables copied from
                                        sf0.001, for Verify + check.py)
"""
import os, shutil, sys
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
REPO_OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "hostile")
FULL_OUT = "/tmp/hostile_full"

HOSTILE = [
    # (text, lang, source) — doc_id/n_chars derived
    ("", "en", "web"),                        # empty string
    (" ", "en", "web"),                       # single space only
    ("   ", "en", "web"),                     # spaces only
    ("hello", "en", "web"),                   # 1 token
    ("hello world", "en", "web"),             # 2 tokens
    (" leading", "en", "books"),              # leading space -> empty token
    ("trailing ", "en", "books"),             # trailing space -> empty token
    (" both sides ", "en", "books"),          # both
    ("double  space", "en", "books"),         # consecutive delimiters
    ("  double  space  everywhere  ", "en", "news"),
    ("tab\tseparated words here", "en", "news"),   # tab is NOT the delimiter
    ("line\nbreak token stream", "en", "news"),    # newline is NOT either
    ("héllo wörld café 世界", "de", "news"),  # unicode
    ("x x x x x x x x", "en", "wiki"),        # pure repetition
    ("!!! ??? ... ---", "en", "wiki"),        # punctuation-only tokens
    ("a " * 40 + "b", "en", "wiki"),          # long run, trailing pattern
]


def main():
    docs = pq.read_table(f"{SF}/documents.parquet")
    base_rows = docs.num_rows
    ids = list(range(base_rows, base_rows + len(HOSTILE)))
    hostile = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([t for t, _, _ in HOSTILE], pa.string()),
        "lang": pa.array([l for _, l, _ in HOSTILE], pa.string()),
        "source": pa.array([s for _, _, s in HOSTILE], pa.string()),
        "n_chars": pa.array([len(t) for t, _, _ in HOSTILE], pa.int64()),
    })
    # keep the real corpus underneath so every query still has signal mass
    combined = pa.concat_tables([docs.select(hostile.column_names), hostile])

    os.makedirs(REPO_OUT, exist_ok=True)
    pq.write_table(combined, f"{REPO_OUT}/documents.parquet")
    os.makedirs(FULL_OUT, exist_ok=True)
    pq.write_table(combined, f"{FULL_OUT}/documents.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copyfile(f"{SF}/{t}.parquet", f"{FULL_OUT}/{t}.parquet")
    print(f"wrote {combined.num_rows} docs ({len(HOSTILE)} hostile) to "
          f"{REPO_OUT} and full table set to {FULL_OUT}")


if __name__ == "__main__":
    sys.exit(main())
