#!/usr/bin/env python3
"""Pair-family miss census: measured recall of the blocking caps
(round-11 verdict #5).

The exact-pair family bounds candidate volume with two caps — the
stop-shingle df-cap (df <= 64: ngram_jaccard_pairs, containment_pairs,
jaccard_prefix_join) and the levenshtein stop-block cap (block <= 32
docs). Both trade a documented miss class for linear candidates. This
tool MEASURES that trade on a given documents corpus by running each
query's own oracle SQL twice — verbatim (capped) and with the cap
predicate relaxed (uncapped truth) — and reporting

    recall = |capped result| / |uncapped result|   (pair-id multisets;
             capped is a subset of uncapped by construction)

plus the df / block censuses that explain it. For levenshtein_pairs the
census compares the CANDIDATE pair set (the `scored` CTE, pre-top-K):
the per-doc top-K rank is applied identically on both sides of the
engine/oracle compare and is not part of the miss model.

Why two corpus shapes: the driver's fixed 31-word vocabulary makes every
shingle's df grow linearly with n — the adversarial regime for df-caps
(eventually every shingle is a stop-shingle). Real corpora grow
vocabulary by Heaps' law, so df concentrates in a boilerplate head while
the tail stays rare — the regime the caps were designed for. Run this on
both (tools/make_sf1.py and its SFN_HEAPS=1 variant) and commit the
table to COVERAGE.md.

Usage:
  python3 tools/miss_census.py <docsDir> <oracle_sql.json> [--out X.json]

The SQL surgery is pattern-asserted: if a cap predicate is not found
exactly where expected the tool aborts rather than silently censusing
the wrong thing.
"""
import argparse
import json
import os
import sys
import time

import duckdb

BIG = "1000000000"


def relax(sql, name):
    if name == "levenshtein_pairs":
        cut = sql.find("), directed AS (")
        if cut < 0:
            sys.exit(f"{name}: scored-CTE marker not found")
        head = sql[:cut] + ")\nSELECT a_id, b_id, dist FROM scored"
        capped = head
        uncapped = head.replace(f"HAVING COUNT(*) <= 32",
                                f"HAVING COUNT(*) <= {BIG}")
        if uncapped == head:
            sys.exit(f"{name}: block-cap predicate not found")
        # dist is functionally determined by the pair; carried for the
        # top-K agreement metric below
        return capped, uncapped, ["a_id", "b_id", "dist"]
    n = sql.count("df <= 64")
    if n < 1:
        sys.exit(f"{name}: df-cap predicate not found")
    uncapped = sql.replace("df <= 64", f"df <= {BIG}")
    keys = {"ngram_jaccard_pairs": ["a_id", "b_id"],
            "containment_pairs": ["inner_id", "outer_id"],
            "jaccard_prefix_join": ["a_id", "b_id"]}[name]
    return sql, uncapped, keys


def census_blocks(con):
    """df census over 3-shingles + levenshtein chunk-block census."""
    df_sql = """
    WITH sh AS (SELECT DISTINCT doc_id,
      unnest(list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1)
    SELECT COUNT(*) AS n_shingles, MAX(df) AS max_df,
           quantile_disc(df, 0.99) AS p99_df,
           SUM(CASE WHEN df > 64 THEN 1 ELSE 0 END) AS n_stop,
           SUM(CASE WHEN df > 64 THEN df ELSE 0 END) * 1.0 / SUM(df)
             AS stop_occurrence_share
    FROM dfreq"""
    blk_sql = """
    WITH d AS (SELECT doc_id,
        regexp_replace(substr(text, 1, 24), '[^\\x00-\\x7F]', '?', 'g')
          AS prefix,
        CAST(length(text) // 50 AS BIGINT) AS len_band FROM documents),
    bands AS (SELECT doc_id, len_band, i AS bp,
        substr(prefix, 1 + 6 * i, 6) AS key
      FROM d CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
      WHERE substr(prefix, 1 + 6 * i, 6) <> ''),
    blocks AS (SELECT COUNT(*) AS n FROM bands GROUP BY len_band, bp, key)
    SELECT COUNT(*) AS n_blocks, MAX(n) AS max_block,
           quantile_disc(n, 0.99) AS p99_block,
           SUM(CASE WHEN n > 32 THEN 1 ELSE 0 END) AS n_over_cap
    FROM blocks"""
    df_row = con.execute(df_sql).df().to_dict("records")[0]
    blk_row = con.execute(blk_sql).df().to_dict("records")[0]
    return ({k: (float(v) if "share" in k else int(v))
             for k, v in df_row.items()},
            {k: int(v) for k, v in blk_row.items()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("docs_dir")
    ap.add_argument("oracle_json")
    ap.add_argument("--out")
    ap.add_argument("--mem", default="24GB")
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill_%d'" % os.getpid())
    con.execute("SET max_temp_directory_size='32GiB'")
    con.execute("SET memory_limit='%s'" % args.mem)
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{args.docs_dir}/documents.parquet'")
    oracle = json.load(open(args.oracle_json))

    result = {"docs_dir": args.docs_dir}
    result["shingle_df_census"], result["lev_block_census"] = \
        census_blocks(con)
    print(json.dumps({k: result[k] for k in
                      ("shingle_df_census", "lev_block_census")}, indent=1))

    for name in ["ngram_jaccard_pairs", "containment_pairs",
                 "jaccard_prefix_join", "levenshtein_pairs"]:
        capped_sql, uncapped_sql, keys = relax(oracle[name], name)
        kl = ", ".join(keys)
        t0 = time.time()
        con.execute(f"CREATE OR REPLACE TEMP TABLE c_res AS "
                    f"SELECT DISTINCT {kl} FROM ({capped_sql})")
        t_cap = time.time() - t0
        t0 = time.time()
        con.execute(f"CREATE OR REPLACE TEMP TABLE u_res AS "
                    f"SELECT DISTINCT {kl} FROM ({uncapped_sql})")
        t_unc = time.time() - t0
        n_cap = con.execute("SELECT COUNT(*) FROM c_res").fetchone()[0]
        n_unc = con.execute("SELECT COUNT(*) FROM u_res").fetchone()[0]
        n_missed = con.execute(
            "SELECT COUNT(*) FROM (SELECT * FROM u_res EXCEPT "
            "SELECT * FROM c_res)").fetchone()[0]
        n_extra = con.execute(
            "SELECT COUNT(*) FROM (SELECT * FROM c_res EXCEPT "
            "SELECT * FROM u_res)").fetchone()[0]
        row = {"capped_pairs": n_cap, "uncapped_pairs": n_unc,
               "missed": n_missed, "extra_not_in_truth": n_extra,
               "recall": round(1.0 - n_missed / n_unc, 4) if n_unc else 1.0,
               "capped_sec": round(t_cap, 1), "uncapped_sec": round(t_unc, 1)}
        if name == "levenshtein_pairs":
            # the user-facing round-12 contract is per-doc top-5, so the
            # meaningful recall is top-K agreement: how many of the
            # uncapped-blocking top-5 (doc, nbr) slots survive the cap
            topk = ("SELECT doc_id, nbr_id FROM ("
                    "  SELECT doc_id, nbr_id, ROW_NUMBER() OVER ("
                    "    PARTITION BY doc_id ORDER BY dist, nbr_id) AS rk"
                    "  FROM (SELECT a_id AS doc_id, b_id AS nbr_id, dist"
                    "        FROM {t} UNION ALL"
                    "        SELECT b_id, a_id, dist FROM {t})"
                    ") WHERE rk <= 5")
            n_top_u = con.execute("SELECT COUNT(*) FROM ("
                                  + topk.format(t="u_res") + ")").fetchone()[0]
            n_top_missed = con.execute(
                "SELECT COUNT(*) FROM ((" + topk.format(t="u_res")
                + ") EXCEPT (" + topk.format(t="c_res") + "))").fetchone()[0]
            row["topk_truth_slots"] = n_top_u
            row["topk_missed"] = n_top_missed
            row["topk_recall"] = (round(1.0 - n_top_missed / n_top_u, 4)
                                  if n_top_u else 1.0)
        result[name] = row
        print(name, json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
