#!/usr/bin/env python3
"""Dev-only NATIVE sfN generator: a coherent SCALE-x-of-sf0.1 table set
so the full catalog can run Verify + Bench at a true sf1.0 / sf10
instead of extrapolating from the per-family 10x inflations
(tools/make_scaled_*.py). Unlike those, every table scales TOGETHER with
consistent join keys and naturally grown group sizes — the honest
"does the whole catalog survive 10x" shape the round-9 verdict asked
for; round 12 generalizes it one more decade (SFN_SCALE=100 -> sf10:
~60M lineitem, 15M orders, 1.5M customers, 10M events, 500k documents,
200k embeddings).

Distributions mirror the driver's sf0.1 testdata (measured 2026-08,
round 10): same schemas, key ranges scaled SCALE-x, same value domains
(quantity 1..50, discount 0..0.10 by cents, events value ~ Exp(50)
capped at 2dp, props = {"k": 0..99}, doc vocab = the sf0.1 vocabulary
with its empirical unigram weights, ~0.16% exact-duplicate docs plus a
few near-dups for the dedup family, unit-norm 64-dim float32
embeddings with uniform labels 0..9). region/nation copy verbatim.
Topic count grows as sqrt(n_docs) (256 at sf1) — real corpora add
topical diversity sublinearly as they grow.

Env knobs:
  SFN_SCALE  multiplier vs sf0.1 (default 10 = sf1; 100 = sf10). At the
             default the RNG stream is call-for-call identical to the
             round-10 sf1 generator, so /tmp/sf1 is bit-stable.
  SF1_OUT    output dir (default /tmp/sf1 for SCALE=10, /tmp/sf<N>).
  SFN_HEAPS  1 -> Heaps-law documents variant: vocabulary grows as
             K*sqrt(tokens) (K=5, ~8k types at sf1 scale) with a
             Zipf(1.1) tail holding 50% of the token mass, instead of
             the driver's fixed 31-word vocab. The fixed-vocab corpus is
             the adversarial case for df-capped blocking (every shingle's
             df grows with n); the Heaps corpus is the realistic case —
             the round-11 verdict asked for the pair-family miss census
             on BOTH shapes. Writes documents.parquet only; its RNG
             stream is NOT aligned with the full-table run.

Output: <out>/*.parquet (timestamps written as TIMESTAMP(us)).
Seed fixed; the run is deterministic.
"""
import collections
import json
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
SCALE = int(os.environ.get("SFN_SCALE", "10"))
HEAPS = os.environ.get("SFN_HEAPS", "") == "1"
_default_out = "/tmp/sf%g" % (SCALE / 10.0) + ("_heaps" if HEAPS else "")
OUT = os.environ.get("SF1_OUT", _default_out)
US = 1_000_000

rng = np.random.default_rng(4242)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"wrote {table.num_rows:>9} {name}")


def ts_us(days_lo, days_hi, n, epoch_day):
    """n uniform micro-timestamps in [lo, hi) days past epoch_day."""
    d = rng.integers(days_lo, days_hi, n)
    return (epoch_day + d) * 86400 * US


def gen_documents(n_docs):
    """documents table: sf0.1 vocabulary, topic-mixture unigram weights.

    Optionally (HEAPS) augments the vocabulary with a Zipf(1.1) tail sized
    by Heaps' law so word-type count grows ~sqrt(tokens) like real corpora.
    """
    import duckdb
    texts01 = [r[0] for r in duckdb.sql(
        f"SELECT text FROM '{SF01}/documents.parquet'").fetchall()]
    freq = collections.Counter(w for t in texts01 for w in t.split())
    vocab = np.array(sorted(freq))
    w_probs = np.array([freq[w] for w in vocab], dtype=np.float64)
    w_probs /= w_probs.sum()
    if HEAPS:
        # Heaps' law V = K * tokens^beta with K=5, beta=0.5; average doc is
        # ~52 tokens. The tail gets HALF the token mass via Zipf(1.1) —
        # high-df boilerplate words keep existing (the base vocab), but
        # half of every doc is now drawn from a growing long tail, so
        # shingle df STOPS growing linearly with n: the realistic regime.
        est_tokens = n_docs * 52
        v_extra = int(5 * est_tokens ** 0.5)
        extra = np.array([f"hw{i}" for i in range(v_extra)])
        zipf_w = 1.0 / np.arange(1, v_extra + 1) ** 1.1
        vocab = np.concatenate([vocab, extra])
        w_probs = np.concatenate(
            [w_probs * 0.5, 0.5 * zipf_w / zipf_w.sum()])
        print(f"heaps vocab: {len(vocab)} types ({v_extra} tail)")
    langs = np.array(["en", "zh", "fr", "es", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    target = rng.integers(44, 578, n_docs)
    # topical diversity grows sublinearly with corpus size (256 at sf1)
    n_topics = int(round(256 * (n_docs / 50_000) ** 0.5))
    boost = np.ones((n_topics, len(vocab)))
    for t in range(n_topics):
        sel = rng.choice(len(vocab), size=max(2, len(vocab) // 5),
                         replace=False)
        boost[t, sel] = 30.0
    topic_p = boost * w_probs
    topic_p /= topic_p.sum(axis=1, keepdims=True)
    doc_topics = rng.integers(0, n_topics, (n_docs, 3))
    doc_mix = rng.dirichlet(np.ones(3), n_docs)
    texts = []
    for i in range(n_docs):
        p = (doc_mix[i][:, None] * topic_p[doc_topics[i]]).sum(axis=0)
        words, ln = [], -1
        while ln < target[i]:
            for w in vocab[rng.choice(len(vocab), size=24, p=p)]:
                words.append(w)
                ln += len(w) + 1
                if ln >= target[i]:
                    break
        texts.append(" ".join(words))
    # dedup-family seeding: ~0.16% exact duplicates + a few near-dups
    # (one word substituted), matching sf0.1's measured dup density
    for i in rng.choice(np.arange(1, n_docs), int(n_docs * 0.0016),
                        replace=False):
        texts[i] = texts[int(rng.integers(0, i))]
    for i in rng.choice(np.arange(1, n_docs), int(n_docs * 0.0008),
                        replace=False):
        src = texts[int(rng.integers(0, i))].split()
        src[int(rng.integers(0, len(src)))] = str(
            vocab[int(rng.integers(0, len(vocab)))])
        texts[i] = " ".join(src)
    write("documents", pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": langs[rng.choice(5, n_docs, p=lang_p)],
        "source": np.array([f"src{s}" for s in rng.integers(0, 20, n_docs)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))


def main():
    os.makedirs(OUT, exist_ok=True)
    if HEAPS:
        gen_documents(n_docs=5_000 * SCALE)
        print(f"done -> {OUT}")
        return
    # --- region / nation: fixed dimensions, copy verbatim ---
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SF01}/{t}.parquet"), f"{OUT}/{t}.parquet")
        print(f"copied {t}")

    n_cust, n_supp, n_part = 15_000 * SCALE, 1_000 * SCALE, 20_000 * SCALE
    n_ord = 150_000 * SCALE

    # --- customer ---
    ck = np.arange(n_cust, dtype=np.int64)
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"])
    write("customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{k:09d}" for k in ck]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": segs[rng.integers(0, 5, n_cust)],
    }))

    # --- supplier ---
    sk = np.arange(n_supp, dtype=np.int64)
    write("supplier", pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{k:09d}" for k in sk]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # --- part (p_retailprice follows sf0.1's 900 + (key % 1000)/10 ramp) ---
    pk = np.arange(n_part, dtype=np.int64)
    adjs = np.array(["large", "hot", "blue", "old", "cold", "small", "red",
                     "green", "new", "dark"])
    nouns = np.array(["ring", "bolt", "plate", "gear", "wheel", "pin",
                      "cap", "rod"])
    types = np.array(["ECONOMY", "PROMO", "LARGE", "STANDARD", "SMALL",
                      "MEDIUM"])
    name_col = np.char.add(np.char.add(adjs[rng.integers(0, len(adjs), n_part)],
                                       " "),
                           nouns[rng.integers(0, len(nouns), n_part)])
    write("part", pa.table({
        "p_partkey": pk,
        "p_name": name_col,
        "p_brand": np.array([f"Brand#{b}" for b in
                             rng.integers(1, 26, n_part)]),
        "p_type": types[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 1),
    }))

    # --- orders (dates 1995-01-01 .. 2001-08-01, day granularity) ---
    epoch_1995 = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")
                  ) // np.timedelta64(1, "D")
    span_days = (np.datetime64("2001-08-02") - np.datetime64("1995-01-01")
                 ) // np.timedelta64(1, "D")
    ok = np.arange(n_ord, dtype=np.int64)
    odate = ts_us(0, int(span_days), n_ord, int(epoch_1995))
    pris = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                     "5-LOW"])
    stats = np.array(["O", "F", "P"])
    write("orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": stats[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pris[rng.integers(0, 5, n_ord)],
    }))

    # --- lineitem: lines-per-order from sf0.1's empirical distribution ---
    import duckdb
    dist = duckdb.sql(
        f"SELECT cnt, COUNT(*) FROM (SELECT l_orderkey, COUNT(*) cnt "
        f"FROM '{SF01}/lineitem.parquet' GROUP BY 1) GROUP BY 1 ORDER BY 1"
    ).fetchall()
    counts = np.array([c for c, _ in dist])
    probs = np.array([w for _, w in dist], dtype=np.float64)
    probs /= probs.sum()
    lines_per = rng.choice(counts, size=n_ord, p=probs)
    n_li = int(lines_per.sum())
    l_orderkey = np.repeat(ok, lines_per)
    l_linenumber = (np.arange(n_li) -
                    np.repeat(np.cumsum(lines_per) - lines_per, lines_per)
                    + 1).astype(np.int32)
    rf = np.array(["A", "N", "R"])
    ls = np.array(["O", "F"])
    ship = np.repeat(odate, lines_per) + \
        rng.integers(1, 121, n_li) * 86400 * US
    write("lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": l_linenumber,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": rf[rng.integers(0, 3, n_li)],
        "l_linestatus": ls[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    # --- events: same 30-day window, SCALE-x volume and users ---
    n_ev, n_users = 100_000 * SCALE, 1_500 * SCALE
    base = (np.datetime64("2024-01-01") - np.datetime64("1970-01-01")
            ) // np.timedelta64(1, "us")
    gaps = rng.exponential(30 * 86400 * US / n_ev, n_ev)
    ets = (int(base) + np.cumsum(gaps)).astype(np.int64)
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    ks = rng.integers(0, 100, n_ev)
    write("events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": etypes[rng.integers(0, 5, n_ev)],
        "value": np.round(np.minimum(rng.exponential(50, n_ev), 560.0), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in ks]),
    }))

    # --- documents: sf0.1 vocabulary, TOPIC-MIXTURE unigram weights ---
    # The driver's corpus is a flat unigram draw over a 31-word vocab. At
    # 5k docs that is merely unrealistic; at 50k it is degenerate for the
    # near-dup family: every long doc's SimHash converges to the same
    # majority pattern (measured: 146.4M hamming<=10 pairs at a flat-draw
    # sf1 — a synthetic near-clique whose OUTPUT is quadratic, which no
    # plan can produce in sub-quadratic time). Real corpora are topical,
    # so sf1 docs each draw from a 3-topic mixture over 256 topics (each
    # topic boosts a random ~1/5 of the vocab 30x). Lengths, vocabulary,
    # language/source mixes and the planted dup density still mirror
    # sf0.1; only the word CO-OCCURRENCE structure gains the topical
    # diversity the dedup family needs to behave like production data.
    gen_documents(n_docs=5_000 * SCALE)

    # --- embeddings: 64-dim unit-norm float32, labels 0..9 ---
    n_vec, dim = 2_000 * SCALE, 64
    m = rng.standard_normal((n_vec, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m = m.astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1)), dim).cast(pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_vec).astype(np.int32),
    }))
    print(f"done -> {OUT}")


if __name__ == "__main__":
    sys.exit(main())
