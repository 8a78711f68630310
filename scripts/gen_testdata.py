"""Deterministic testdata generator for SFs the driver didn't ship.

The driver provides /root/testdata/sf{0.001,0.01,0.1} (read-only,
seed=42). The r4 verdict requires cross-SF scaling EVIDENCE up to sf1:
this script extends the same star schema to any SF, matching the
driver data's observed schemas (parquet physical types included:
timestamp[us], int32 dims, list<float> embeddings) and distributions,
measured from the shipped files:

  - row counts:        customer 150k·sf, supplier 10k·sf, part 200k·sf,
                       orders 1.5M·sf, lineitem 6M·sf, events 1M·sf,
                       documents max(500, 50k·sf), embeddings
                       max(500, 20k·sf)  [all verified against the three
                       shipped SFs]
  - orders:            status/priority uniform, totalprice U(1000,500k),
                       orderdate uniform days over 1995-01-01..2001-08-01
  - lineitem:          orderkey uniform (lines/order ≈ Poisson(4), matches
                       the observed 147236/150000 distinct), linenumber
                       U{1..7}, quantity U{1..50}, extprice U(900,105k),
                       discount U{0,.01..,.10}, tax U{0..,.08}, shipdate
                       uniform days over 1995-01-02..2001-11-04
                       (independent of orderdate — observed delta ±2400d)
  - events:            ts = cumulative U-gaps over 30 days of 2024-01,
                       user_id U{0..ncust/10-1}, value Exp(mean 50) 2dp
                       (observed median 34.7 / p90 114.3 ≈ Exp(50)),
                       props {"k": U{0..99}}
  - documents:         31-word vocab (the shipped vocab verbatim),
                       10..100 words/doc, lang en=40%/de=es=fr=zh=15%,
                       source src0..19; ~4.7% near-dup copies (10% word
                       mutation) + ~0.16% exact dups — both measured
                       from sf0.1 (233 shared-prefix groups, 8 exact)
  - embeddings:        64-dim N(0,1) normalized to unit L2, label
                       U{0..9} (shipped vectors are NOT label-clustered:
                       measured same-label mean cosine 0.0008)

sf1 lineitem is ~6M rows (~100 MB parquet) — written with 600k-row
row groups so Spark's scan parallelizes like a multi-file production
layout (the shipped single-row-group files serialize the scan into
one task, which under-reports Spark at larger SFs).

Usage: python scripts/gen_testdata.py <sf> <outdir>
       python scripts/gen_testdata.py 1 /root/repo/testdata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.40, 0.15, 0.15, 0.15, 0.15]
# the shipped corpus vocabulary, verbatim
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
P_ADJ = ["large", "hot", "blue", "small", "cold", "red", "green", "dim"]
P_NOUN = ["ring", "bolt", "screw", "nut", "gear", "cap", "rod", "pin"]

DAY_US = 86_400_000_000
ORDER_EPOCH = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
ORDER_DAYS = int(
    (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
)
SHIP_EPOCH = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
SHIP_DAYS = int(
    (np.datetime64("2001-11-04") - np.datetime64("1995-01-02")).astype(int)
)
EV_EPOCH = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EV_SPAN_US = 30 * DAY_US

ROW_GROUP = 600_000


def _write(outdir: str, name: str, table: pa.Table) -> None:
    # Split every table into >=32 row groups (capped at ROW_GROUP rows)
    # so Spark's scan parallelizes like a multi-file production layout.
    # A single-row-group customer/documents file serializes not just the
    # scan but every downstream narrow stage into ONE task — at sf1 that
    # under-reported Spark by >10x on the text-heavy queries. Content is
    # unchanged; only the physical layout differs.
    rg = max(4096, min(ROW_GROUP, table.num_rows // 32 + 1))
    pq.write_table(table, f"{outdir}/{name}.parquet", row_group_size=rg)


def _ts(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def _round2(x: np.ndarray) -> np.ndarray:
    return np.round(x, 2)


def gen(sf: float, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    n_cust = round(150_000 * sf)
    n_supp = round(10_000 * sf)
    n_part = round(200_000 * sf)
    n_ord = round(1_500_000 * sf)
    n_li = round(6_000_000 * sf)
    n_ev = round(1_000_000 * sf)
    n_doc = max(500, round(50_000 * sf))
    n_emb = max(500, round(20_000 * sf))
    n_users = max(15, n_cust // 10)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    r = np.random.default_rng(SEED + 1)
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _round2(r.uniform(-999.99, 9999.99, n_cust)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[r.integers(0, 5, n_cust)]),
    }))

    r = np.random.default_rng(SEED + 2)
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _round2(r.uniform(-999.99, 9999.99, n_supp)),
    }))

    r = np.random.default_rng(SEED + 3)
    keys = np.arange(n_part)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": [
            f"{P_ADJ[a]} {P_NOUN[b]}"
            for a, b in zip(r.integers(0, 8, n_part), r.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in r.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(PTYPES)[r.integers(0, 6, n_part)]),
        "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": _round2(900.0 + (keys % 1000) * 0.1),
    }))

    r = np.random.default_rng(SEED + 4)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(r.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[r.integers(0, 3, n_ord)]),
        "o_totalprice": _round2(r.uniform(1000.0, 500_000.0, n_ord)),
        "o_orderdate": _ts(
            ORDER_EPOCH + r.integers(0, ORDER_DAYS + 1, n_ord) * DAY_US
        ),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[r.integers(0, 5, n_ord)]),
    }))

    r = np.random.default_rng(SEED + 5)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(r.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(r.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(r.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(r.integers(1, 8, n_li), pa.int32()),
        "l_quantity": r.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _round2(r.uniform(900.0, 105_000.0, n_li)),
        "l_discount": r.integers(0, 11, n_li) / 100.0,
        "l_tax": r.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[r.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUSES)[r.integers(0, 2, n_li)]),
        "l_shipdate": _ts(
            SHIP_EPOCH + r.integers(0, SHIP_DAYS + 1, n_li) * DAY_US
        ),
    }))

    r = np.random.default_rng(SEED + 6)
    ts = EV_EPOCH + np.sort(r.integers(0, EV_SPAN_US, n_ev))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts(ts),
        "user_id": pa.array(r.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[r.integers(0, 5, n_ev)]),
        "value": _round2(r.exponential(50.0, n_ev)),
        "props": [json.dumps({"k": int(k)}) for k in r.integers(0, 100, n_ev)],
    }))

    r = np.random.default_rng(SEED + 7)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_doc):
        u = r.random()
        if i > 10 and u < 0.0016:  # exact duplicate of a prior doc
            texts.append(texts[int(r.integers(0, i))])
            continue
        if i > 10 and u < 0.047 + 0.0016:  # near-dup: ~10% word mutation
            words = texts[int(r.integers(0, i))].split(" ")
            k = max(1, len(words) // 10)
            for j in r.integers(0, len(words), k):
                words[int(j)] = str(vocab[int(r.integers(0, len(vocab)))])
            texts.append(" ".join(words))
            continue
        n_words = int(r.integers(10, 101))
        texts.append(" ".join(vocab[r.integers(0, len(vocab), n_words)]))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[r.choice(5, n_doc, p=LANG_W)]),
        "source": [f"src{i}" for i in r.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    r = np.random.default_rng(SEED + 8)
    vecs = r.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(r.integers(0, 10, n_emb), pa.int32()),
    }))

    print(f"wrote sf={sf} -> {outdir}: "
          f"lineitem={n_li} orders={n_ord} events={n_ev} docs={n_doc}")


if __name__ == "__main__":
    gen(float(sys.argv[1]), sys.argv[2])
