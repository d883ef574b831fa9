"""Arm-by-arm noop-sink profile of llm_ann_recall (round 14).

Times each ANN arm of the recall query independently (forced with the
noop sink, guide §1.4), then the full registered query, in ONE warm
process: run twice per arm, report both (run1 carries codegen/JIT).

Usage: python tools/profile_ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sig_etl_spark import llm  # noqa: E402,F401
from sig_etl_spark.llm import similarity as S  # noqa: E402
from sig_etl_spark.queries import QUERIES  # noqa: E402
from sig_etl_spark.queries.llm_similarity import (  # noqa: E402
    _BANDS,
    _DIM,
    _HI_BANDS,
    _HI_NPROBE,
    _HI_PLANES,
    _IVFPQ_NPROBE,
    _IVFPQ_SHORTLIST,
    _K,
    _N_CENTROIDS,
    _NPROBE,
    _PLANES_PER_BAND,
    _PQ_KSUB,
    _PQ_M,
    _SEED,
)
from sig_etl_spark.session import get_spark  # noqa: E402
from sig_etl_spark.tables import load_table  # noqa: E402


def t(spark, label, df, runs=2):
    outs = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(f"profile:{label}")
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        outs.append(time.monotonic() - t0)
    print(f"{label:28s} " + "  ".join(f"{x:6.2f}" for x in outs), flush=True)
    return outs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_ann_recall")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)

    arms = {
        "brute_np": lambda: S.brute_force_topk(queries, corpus, "vec_id", "embedding", k=_K),
        "lsh_b2p4": lambda: S.lsh_topk(queries, corpus, "vec_id", "embedding", k=_K, dim=_DIM, bands=_BANDS, planes_per_band=_PLANES_PER_BAND, seed=_SEED),
        "lsh_b8p3": lambda: S.lsh_topk(queries, corpus, "vec_id", "embedding", k=_K, dim=_DIM, bands=_HI_BANDS, planes_per_band=_HI_PLANES, seed=_SEED),
        "ivf_np3": lambda: S.ivf_topk(queries, corpus, "vec_id", "embedding", k=_K, n_centroids=_N_CENTROIDS, nprobe=_NPROBE),
        "ivf_np12": lambda: S.ivf_topk(queries, corpus, "vec_id", "embedding", k=_K, n_centroids=_N_CENTROIDS, nprobe=_HI_NPROBE),
        "int8": lambda: S.int8_topk(queries, corpus, "vec_id", "embedding", k=_K),
        "pq_np": lambda: S.pq_topk(queries, corpus, "vec_id", "embedding", k=_K, m_subs=_PQ_M, ksub=_PQ_KSUB, dim=_DIM),
        "ivfpq_np": lambda: S.ivfpq_topk(queries, corpus, "vec_id", "embedding", k=_K, n_centroids=_N_CENTROIDS, nprobe=_IVFPQ_NPROBE, m_subs=_PQ_M, ksub=_PQ_KSUB, dim=_DIM, shortlist=_IVFPQ_SHORTLIST),
    }
    for label, mk in arms.items():
        t(spark, label, mk())

    t(spark, "FULL llm_ann_recall", QUERIES["llm_ann_recall"].builder(spark, sf_dir), runs=3)
    spark.stop()


if __name__ == "__main__":
    main()
