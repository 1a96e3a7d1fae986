#!/usr/bin/env python3
"""Generate scale-factor testdata matching the driver's sf0.1 schemas
and distributions (TESTDATA.md tables), for in-repo scale validation.

The driver's /root/testdata is read-only and tops out at sf0.1; round-8
scale validation needs ~10x that. This produces the same ten tables with
the same column names/types/category values and the same statistical
shape (duplicate rate, source fan-out, label balance, date ranges), so
every query + DuckDB oracle runs unmodified against the output dir.
Deterministic: seed fixed at 42.

Usage: python3 tools/gen_testdata.py <sf> <outdir>   # e.g. 1.0 testdata/sf1
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
ADJS = ["large", "hot", "blue", "old", "cold", "small", "new", "red", "dim", "pale"]
NOUNS = ["ring", "bolt", "plate", "gear", "rod", "cap", "pin", "disc", "hub", "cam"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
N_SOURCES = 20
EMB_DIM = 64
N_LABELS = 10


def write(outdir, name, table):
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def ts_ms(days_float, base="1995-01-01"):
    base_ms = np.datetime64(base, "ms").astype("int64")
    ms = base_ms + (days_float * 86_400_000).astype("int64")
    return pa.array(ms, type=pa.int64()).cast(pa.timestamp("ms"))


def gen(sf, outdir):
    rng = np.random.RandomState(SEED)
    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation: fixed dimension tables at every sf
    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32())}))

    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.randint(0, 5, n_cust)])}))

    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2)}))

    write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), type=pa.int64()),
        "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in
                   zip(rng.randint(0, 10, n_part), rng.randint(0, 10, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.randint(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.randint(0, 6, n_part)]),
        "p_size": pa.array(rng.randint(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2)}))

    # orders over 1995-01-01 .. 2001-08-01 (~2404 days)
    odays = rng.uniform(0, 2404, n_ord)
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.randint(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": ts_ms(np.floor(odays)),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.randint(0, 5, n_ord)])}))

    li_order = rng.randint(0, n_ord, n_li)
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(li_order, type=pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li), type=pa.int32()),
        "l_quantity": rng.randint(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.randint(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.randint(0, 2, n_li)]),
        "l_shipdate": ts_ms(np.floor(odays[li_order]) + rng.randint(1, 96, n_li))}))

    # events: one month, ts sorted, event_id sequential
    ev_ns = np.sort(rng.uniform(0, 30 * 86_400_000_000_000, n_ev)).astype("int64") \
        + np.datetime64("2024-01-01", "ns").astype("int64")
    write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), type=pa.int64()),
        "ts": pa.array(ev_ns, type=pa.int64()).cast(pa.timestamp("ns")),
        "user_id": pa.array(rng.randint(0, n_users, n_ev), type=pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.randint(0, 5, n_ev)]),
        # driver value is exponential(scale=50): sf0.1 shows mean 49.9 /
        # std 49.6 / median 34.8 (= ln2*50) / p95 149 (= 3*50); the old
        # uniform(0, 561) matched only the max and had no 3-sigma tail,
        # which made q_outliers trivially empty on generated data
        "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 561.0), 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)]}))

    # documents: word salad over the 31-word vocab; ~4% near-dup copies
    # (1-3 word edits of an earlier doc) and ~0.3% exact copies, matching
    # the sf0.1 rate (206 shared-prefix groups + 8 exact groups / 5000).
    texts = []
    for i in range(n_doc):
        nw = rng.randint(8, 111)
        texts.append(" ".join(np.array(VOCAB)[rng.randint(0, len(VOCAB), nw)]))
    for i in range(1, n_doc):
        r = rng.rand()
        if r < 0.003:
            texts[i] = texts[rng.randint(0, i)]
        elif r < 0.043:
            words = texts[rng.randint(0, i)].split(" ")
            for _ in range(rng.randint(1, 4)):
                words[rng.randint(0, len(words))] = VOCAB[rng.randint(0, len(VOCAB))]
            texts[i] = " ".join(words)
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), type=pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": [f"src{i % N_SOURCES}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64())}))

    # embeddings: 10 unit-norm gaussian blobs in 64d
    centroids = rng.randn(N_LABELS, EMB_DIM)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.randint(0, N_LABELS, n_emb)
    vecs = centroids[labels] + 0.35 * rng.randn(n_emb, EMB_DIM)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), type=pa.int64()),
        "embedding": pa.array(list(vecs.astype("float32")),
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32())}))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"testdata/sf{sys.argv[1]}"
    gen(sf, outdir)
