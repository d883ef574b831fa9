"""Deterministic scale-up generator: sf0.1 -> sfN testdata for bench runs.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). The 100x
scale-readiness claims in VERDICT/BASELINE need at least one *measured*
point above sf0.1, so this tool derives an sf1-shaped dataset from sf0.1
by key-shifted replication — the standard scale-up trick warehouse bench
kits use when the original generator isn't available:

- ``region``/``nation``: fixed dimensions, copied verbatim (as in TPC-H,
  where their cardinality is SF-independent).
- keyed tables (customer/supplier/part/orders/lineitem/events): R replicas,
  replica ``r`` shifts every key by ``r * STRIDE`` so FK relationships stay
  intact and join fan-outs scale linearly.
- ``documents``: replica r>0 applies a seeded per-(doc, replica) word
  permutation. This preserves vocabulary, token counts, stopword ratios and
  language signals (so quality/lang queries see the same distributions)
  while scrambling word n-grams, so shingle-based dedup (Jaccard, MinHash,
  SimHash) sees ~linear growth in near-dup pairs instead of the quadratic
  blowup that verbatim replication would cause (every doc would gain
  C(R,2) artificial near-dup twins).
- ``embeddings``: replica r>0 mixes the original unit vector with a seeded
  random direction (50/50 by norm) and renormalizes — cosine to the
  original lands ~0.7, far below the 0.95 near-dup threshold, again keeping
  pair counts linear while preserving coarse cluster structure for ANN.

Everything is seeded from (row key, replica): rerunning produces
byte-identical output. Usage::

    python tools/gen_scale.py [--replicas 10] [--src /root/testdata/sf0.1] \
        [--dest /root/repo/.testdata/sf1]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from sig_etl_spark.session import get_spark  # noqa: E402

# Larger than any key at sf0.1 (max o_orderkey ~ 6e5); replica r's keys live
# in [r*STRIDE, r*STRIDE + native_max] so cross-replica keys never collide.
STRIDE = 1_000_000_000


def _replicate(df: DataFrame, replicas: int, key_cols: list[str]) -> DataFrame:
    """Union ``replicas`` key-shifted copies; replica 0 is the original."""
    spark = df.sparkSession
    reps = spark.range(replicas).select(F.col("id").cast("long").alias("__r"))
    out = df.crossJoin(F.broadcast(reps))
    for k in key_cols:
        out = out.withColumn(k, (F.col(k) + F.col("__r") * F.lit(STRIDE)).cast("long"))
    return out


def _scale_documents(
    df: DataFrame, replicas: int, eval_disjoint: bool = False
) -> DataFrame:
    """``eval_disjoint`` (round 12, VERDICT r11 task 4): the synthetic
    vocabulary is so small that at sf1 the benchmark side (doc_id % 97
    == 0) covers 58% of the corpus 3-gram space — nearly every training
    position reads poisoned, the inverse of the real-world regime where
    eval suites cover a vanishing gram fraction. With the knob on, 98%
    of bench docs move into a disjoint token namespace ('ev' prefix) so
    their grams can never hit the corpus; the remaining 2% keep the
    shared vocabulary, leaving a small genuine contamination signal.
    Deterministic: membership is (doc_id // 97) % 50 == 0."""
    rep = _replicate(df, replicas, ["doc_id"])

    def permute(batches):
        for pdf in batches:
            texts = []
            for doc_id, r, text in zip(pdf["doc_id"], pdf["__r"], pdf["text"]):
                did = int(doc_id)
                if r != 0:
                    words = text.split(" ")
                    rng = random.Random(did * 131071 + int(r))
                    rng.shuffle(words)
                    text = " ".join(words)
                if eval_disjoint and did % 97 == 0 and (did // 97) % 50 != 0:
                    text = " ".join("ev" + w for w in text.split(" "))
                texts.append(text)
            pdf = pdf.assign(text=texts)
            pdf["n_chars"] = pdf["text"].str.len().astype("int64")
            yield pdf

    return rep.mapInPandas(permute, schema=rep.schema).drop("__r")


def _scale_embeddings(df: DataFrame, replicas: int) -> DataFrame:
    rep = _replicate(df, replicas, ["vec_id"])

    def perturb(batches):
        for pdf in batches:
            vecs = []
            for vec_id, r, emb in zip(pdf["vec_id"], pdf["__r"], pdf["embedding"]):
                v = np.asarray(emb, dtype=np.float64)
                if r != 0:
                    rng = np.random.RandomState((int(vec_id) * 2654435761 + int(r)) % (2**31))
                    noise = rng.standard_normal(v.shape)
                    noise /= np.linalg.norm(noise)
                    v = 0.5 * v / np.linalg.norm(v) + 0.5 * noise
                    v /= np.linalg.norm(v)
                vecs.append(v.astype(np.float32))
            pdf = pdf.assign(embedding=vecs)
            yield pdf

    return rep.mapInPandas(perturb, schema=rep.schema).drop("__r")


# table -> (key columns to shift, output file count at 10x)
KEYED = {
    "customer": (["c_custkey"], 2),
    "supplier": (["s_suppkey"], 1),
    "part": (["p_partkey"], 2),
    "orders": (["o_orderkey", "o_custkey"], 4),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 8),
    "events": (["event_id", "user_id"], 4),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=None)
    ap.add_argument(
        "--eval-disjoint",
        action="store_true",
        help="move 98%% of benchmark-side docs (doc_id %% 97 == 0) into a"
        " disjoint token namespace so span-decontamination rows exercise"
        " the clean-doc bypass path real corpora hit (see"
        " _scale_documents)",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated table subset to write (e.g. 'documents' for"
        " the eval-disjoint span-family fixture) — other tables skipped",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    dest = args.dest or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata", "sf1",
    )
    os.makedirs(dest, exist_ok=True)

    spark = get_spark("gen_scale")
    spark.sparkContext.setLogLevel("ERROR")

    def write(name: str, df: DataFrame, nfiles: int) -> None:
        path = os.path.join(dest, f"{name}.parquet")
        df.repartition(nfiles).write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows -> {path}")

    def wanted(name: str) -> bool:
        return only is None or name in only

    for name in ("region", "nation"):
        if wanted(name):
            write(
                name, spark.read.parquet(os.path.join(args.src, f"{name}.parquet")), 1
            )

    for name, (keys, nfiles) in KEYED.items():
        if not wanted(name):
            continue
        df = spark.read.parquet(os.path.join(args.src, f"{name}.parquet"))
        write(name, _replicate(df, args.replicas, keys).drop("__r"), nfiles)

    if wanted("documents"):
        docs = spark.read.parquet(os.path.join(args.src, "documents.parquet"))
        write(
            "documents",
            _scale_documents(docs, args.replicas, eval_disjoint=args.eval_disjoint),
            2,
        )

    if wanted("embeddings"):
        embs = spark.read.parquet(os.path.join(args.src, "embeddings.parquet"))
        write("embeddings", _scale_embeddings(embs, args.replicas), 1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
