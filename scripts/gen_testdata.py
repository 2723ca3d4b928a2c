"""Synthetic-table generator: schema- and distribution-faithful clones of
the driver-generated /root/testdata tables at an arbitrary scale factor.

The driver ships sf0.001/0.01/0.1 read-only; rare-event exposure for the
oracle gate (float ties, 4dp midpoints, hash collisions) grows with rows,
so round 5 adds an sf1 sweep. The driver's generator isn't in-repo, so
this replicates the OBSERVED schemas and distributions (documented per
table below); cross-engine parity only needs Spark and DuckDB to read the
same files, not the same bytes as the driver would have produced.

Usage:
    python scripts/gen_testdata.py [sf] [out_dir]
    # default: sf=1.0 -> .tmp/sf1 (gitignored; ~170 MB)

Row counts scale linearly from the observed sf0.1 set: lineitem ~6M rows
at sf=1, orders 1.5M, customer 150k, part 200k, supplier 10k, events 1M,
documents 50k, embeddings 20k; nation/region fixed.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# observed vocab of the documents table (31 whitespace tokens, sf0.1)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_P = [0.386, 0.164, 0.16, 0.148, 0.142]
SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
P_ADJ = ["large", "hot", "blue", "red", "small", "green", "cold", "dark"]
P_NOUN = ["ring", "bolt", "screw", "gear", "wheel", "pin", "rod", "cap"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]

DAY_US = 86_400_000_000  # microseconds


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_cust = int(1_500_000 * sf * 0.1)
    n_supp = int(100_000 * sf * 0.1)
    n_part = int(2_000_000 * sf * 0.1)
    n_ord = int(15_000_000 * sf * 0.1)
    n_ev = int(10_000_000 * sf * 0.1)
    n_doc = int(500_000 * sf * 0.1)
    n_emb = int(200_000 * sf * 0.1)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) % 10000 / 10.0, 2),
    }))

    day95 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = int((np.datetime64("2002-01-01") - np.datetime64("1995-01-01"))
                    / np.timedelta64(1, "D"))
    odate = day95 + rng.integers(0, span_days, n_ord) * DAY_US
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, max(n_cust, 1), n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(850.0, 400_000.0, n_ord), 2),
        "o_orderdate": _ts_col(odate),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[
            rng.integers(0, 5, n_ord)]),
    }))

    lines_per_order = rng.integers(1, 8, n_ord)  # mean ~4, TPC-H-ish
    l_orderkey = np.repeat(np.arange(n_ord), lines_per_order)
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate(
        [np.arange(1, c + 1) for c in lines_per_order]
    ) if n_ord else np.array([], dtype=np.int64)
    sdate = day95 + rng.integers(0, span_days, n_li) * DAY_US
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, max(n_part, 1), n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, max(n_supp, 1), n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[
            rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(sdate),
    }))

    ev_start = np.datetime64("2024-01-01", "us").astype("int64")
    # exponential inter-arrival gaps covering ~30 days like the observed set
    gaps = rng.exponential(30 * DAY_US / max(n_ev, 1), n_ev)
    ts = ev_start + np.cumsum(gaps).astype("int64")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_col(ts),
        "user_id": pa.array(rng.integers(0, max(n_cust, 1), n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0.0, 560.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))

    n_tok = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), c)])
        for c in n_tok
    ]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    centers = rng.normal(0.0, 1.0, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] * 0.7 + rng.normal(0.0, 0.7, (n_emb, 64)) / 8.0
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            list(vecs.astype(np.float32)), pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp", f"sf{sf:g}",
    )
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
    print("done")
