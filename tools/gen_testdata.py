"""Deterministic testdata generator for scale factors the driver doesn't
ship (the driver provides read-only sf0.001/0.01/0.1 under /root/testdata).

Schema, cardinality scaling, and value distributions are inferred from the
driver's tables (measured at sf0.1 — see BASELINE.md "sf1 scale point"):

  table       rows(sf)                  notes
  region      5 (fixed)                 copied verbatim from the driver dir
  nation      25 (fixed)                copied verbatim from the driver dir
  customer    150_000 * sf              nationkey uniform 0-24, acctbal U(-1000, 10_000)
  supplier    10_000 * sf
  part        200_000 * sf              retailprice 900 + (key % 1000)/10
  orders      1_500_000 * sf            dates U(1995-01-01, 2001-08-01)
  lineitem    ~4 per order (Poisson)    linenumber 1..n per order
  events      1_000_000 * sf            30-day window, exp inter-arrival,
                                        5 event types, props {"k": 0..99}
  documents   max(500, 50_000 * sf)     31-word vocab, 10-100 words, 20
                                        sources, planted near/exact dups
  embeddings  max(500, 20_000 * sf)     64-dim unit vectors, labels 0-9

Values are NOT bit-identical to the driver's (its generator is not
published) — this data is for BENCH SCALING measurements only, never for
the oracle correctness gate, which runs exclusively on the driver's own
sf0.01. Seed fixed at 42; output is deterministic.

Usage: python tools/gen_testdata.py --sf 1 [--out DIR]
Default output: <repo>/.testdata/sf{sf}/ (gitignored).
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DRIVER_DIR = "/root/testdata/sf0.1"  # fixed dims copied from here

EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PART_ADJ = ["large", "small", "hot", "cold", "blue", "red", "shiny", "dull"]
PART_NOUN = ["ring", "bolt", "washer", "gear", "cog", "pin", "nut", "cam"]
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # ~43% en, rest ~14%
VOCAB = (
    "spark line column order small sort fast value scan batch part query "
    "agg table hash key group stream filter customer slow vector big join "
    "shuffle read write cache plan stage task"
).split()  # 31 words, matching the driver corpus's vocabulary size


def _write(out: str, name: str, cols: dict, schema: pa.Schema) -> None:
    pq.write_table(pa.table(cols, schema=schema), os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {len(next(iter(cols.values())))} rows")


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    for t in ("region", "nation"):  # fixed dims — byte-identical to driver
        shutil.copy(os.path.join(DRIVER_DIR, f"{t}.parquet"), out)
        print(f"  {t}: copied from {DRIVER_DIR}")

    n_cust = int(150_000 * sf)
    ck = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer", {
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in ck],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }, pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                  ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                  ("c_mktsegment", pa.string())]))

    n_supp = int(10_000 * sf)
    sk = np.arange(n_supp, dtype=np.int64)
    _write(out, "supplier", {
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in sk],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }, pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                  ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    n_part = int(200_000 * sf)
    pk = np.arange(n_part, dtype=np.int64)
    _write(out, "part", {
        "p_partkey": pk,
        "p_name": [f"{PART_ADJ[i % 8]} {PART_NOUN[(i // 8) % 8]}" for i in pk],
        "p_brand": [f"Brand#{i % 25}" for i in pk],
        "p_type": np.array(PART_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 2),
    }, pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                  ("p_brand", pa.string()), ("p_type", pa.string()),
                  ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    n_ord = int(1_500_000 * sf)
    ok = np.arange(n_ord, dtype=np.int64)
    day_us = 86_400_000_000
    odate = (
        np.datetime64("1995-01-01", "us").astype(np.int64)
        + rng.integers(0, 2404, n_ord) * day_us
    )
    _write(out, "orders", {
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }, pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                  ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                  ("o_orderdate", pa.timestamp("us")),
                  ("o_orderpriority", pa.string())]))

    # lineitem: Poisson(4) lines per order (clipped to >= 1), linenumber
    # sequential within order — matches the measured per-order histogram.
    per_order = np.clip(rng.poisson(4.0, n_ord), 1, None)
    lk = np.repeat(ok, per_order)
    n_li = len(lk)
    starts = np.concatenate([[0], np.cumsum(per_order)[:-1]])
    linenum = (np.arange(n_li) - np.repeat(starts, per_order) + 1).astype(np.int32)
    sdate = (
        np.datetime64("1995-01-01", "us").astype(np.int64)
        + rng.integers(0, 2500, n_li) * day_us
    )
    _write(out, "lineitem", {
        "l_orderkey": lk,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": linenum,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": sdate,
    }, pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                  ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                  ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                  ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                  ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                  ("l_shipdate", pa.timestamp("us"))]))

    n_ev = int(1_000_000 * sf)
    window_us = 30 * day_us
    gaps = rng.exponential(window_us / n_ev, n_ev)
    ts = (
        np.datetime64("2024-01-01", "us").astype(np.int64)
        + np.minimum(np.cumsum(gaps), window_us - 1).astype(np.int64)
    )
    n_users = int(15_000 * sf)
    _write(out, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, max(n_users, 1), n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(75.0, n_ev).clip(0, 560.21), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }, pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                  ("user_id", pa.int64()), ("event_type", pa.string()),
                  ("value", pa.float64()), ("props", pa.string())]))

    n_doc = max(500, int(50_000 * sf))
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and i % 125 == 124:  # exact duplicate (driver ratio ~8/5000)
            texts.append(texts[i - 1])
            continue
        n_words = int(rng.integers(10, 101))
        words = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n_words)]
        if i > 0 and i % 60 == 59:  # near-duplicate: prior doc, one word edited
            words = texts[i - 1].split()
            words[int(rng.integers(0, len(words)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        texts.append(" ".join(words))
    _write(out, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)],
        "source": [f"src{i % 20}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }, pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                  ("lang", pa.string()), ("source", pa.string()),
                  ("n_chars", pa.int64())]))

    n_emb = max(500, int(20_000 * sf))
    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", {
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(vecs),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }, pa.schema([("vec_id", pa.int64()),
                  ("embedding", pa.list_(pa.float32())),
                  ("label", pa.int32())]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    sf_name = f"sf{args.sf:g}"
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata", sf_name,
    )
    print(f"generating {sf_name} -> {out}")
    generate(args.sf, out, args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
