#!/usr/bin/env python
"""Generate a scaled-up synthetic dataset matching /root/testdata's
schemas and distributions (TESTDATA.md: TPC-H-ish star schema + events
+ documents + embeddings), for scale validation ONLY — official bench
and grading stay on the driver-generated sf0.1/sf0.01 data.

Distribution parameters were measured off the driver's sf0.01/sf0.1
parquet (categorical domains, value ranges, rows-per-order fan-out,
label-cluster shape, doc word vocabulary and length range, exact-dup
fraction). Row counts scale linearly with sf from the driver's ladder:
lineitem = 6M x sf, orders = 1.5M x sf, customer = 150k x sf,
part = 200k x sf, supplier = 10k x sf, events = 1M x sf (users =
15k x sf), documents = 50k x sf, embeddings = 20k x sf; region/nation
stay fixed at 5/25.

Usage: python scripts/gen_scale.py --sf 1.0 --out scratch/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
STATUSES = ["P", "O", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
PTYPES = ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "STANDARD", "LARGE"]
PCOLORS = ["red", "blue", "green", "small", "large", "shiny"]
PNOUNS = ["widget", "bolt", "ring", "gear", "plate", "valve"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()

DAY_US = 86_400_000_000


def write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def ts_us(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us, type=pa.timestamp("us"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="scratch/sf1")
    args = ap.parse_args()
    sf = args.sf
    out = args.out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation (fixed dimensions)
    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # customer
    write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    # supplier
    write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_supp), 2),
    }))

    # part
    write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{PCOLORS[a]} {PNOUNS[b]}"
            for a, b in zip(rng.integers(0, 6, n_part), rng.integers(0, 6, n_part))
        ],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 21)])[
            rng.integers(0, 20, n_part)
        ],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 1000.0, n_part), 2),
    }))

    # orders: orderdate uniform midnight days over 1995-01-01..2001-08-01
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
    n_days = (d1 - d0) // DAY_US
    odate_us = d0 + rng.integers(0, n_days + 1, n_ord) * DAY_US
    write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": ts_us(odate_us),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: uniform random orderkey (Poisson(4) lines/order — matches
    # the ~1.7% zero-line orders observed); shipdate = orderdate + 1..95d
    lok = np.sort(rng.integers(0, n_ord, n_li).astype(np.int64))
    # linenumber = 1..k within each (sorted) orderkey run
    change = np.r_[True, lok[1:] != lok[:-1]]
    run_starts = np.flatnonzero(change)
    lineno = (np.arange(n_li) - np.repeat(run_starts, np.diff(np.r_[run_starts, n_li])) + 1)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    unit = rng.uniform(900.0, 2100.0, n_li)
    ship_us = odate_us[lok] + rng.integers(1, 96, n_li) * DAY_US
    write(out, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": pa.array(lineno, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(LINESTATUSES)[rng.integers(0, 2, n_li)],
        "l_shipdate": ts_us(ship_us),
    }))

    # events: January 2024, exponential(50) values, ~66 events/user
    e0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span = 30 * DAY_US
    ev_ts = e0 + rng.integers(0, span, n_ev)
    write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts_us(np.sort(ev_ts)),
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 8..105 words from the 31-word vocab; ~0.16% exact dups
    # + ~0.5% near-dups (1-word substitution) for the dedup operators
    n_words = rng.integers(8, 106, n_doc)
    vocab = np.array(DOC_VOCAB)
    texts: list[str] = []
    for k in n_words:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    n_exact = max(1, int(0.0016 * n_doc))
    n_near = max(1, int(0.005 * n_doc))
    for i in range(n_exact):
        texts[n_doc - 1 - i] = texts[int(rng.integers(0, n_doc - n_exact - n_near))]
    for i in range(n_near):
        src = texts[int(rng.integers(0, n_doc - n_exact - n_near))].split()
        src[int(rng.integers(0, len(src)))] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[n_doc - 1 - n_exact - i] = " ".join(src)
    write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 64-dim unit-norm, 10 weak label clusters (centroid norm
    # ~0.07, within-cluster std ~0.125 — measured off the driver data)
    dim = 64
    centers = rng.normal(0, 0.07 / np.sqrt(dim), (10, dim))
    labels = rng.integers(0, 10, n_emb)
    X = centers[labels] + rng.normal(0, 0.125, (n_emb, dim))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            [row for row in X.astype(np.float32)], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))
    print(f"done: sf={sf} -> {out}")


if __name__ == "__main__":
    main()
