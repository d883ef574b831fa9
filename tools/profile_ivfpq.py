"""Per-stage wall profile of llm_knn_ivfpq at a given sf dir.

Locates where the sf1 swing (BASELINE round-14 adjudication: 11.4-17.6s
in-process) actually lives: the PQ-encode corpus scan, the separate
cell-assignment scan + corpus self-join, the ADC shortlist, or the
exact rerank. Run fresh-process (one JVM per invocation) to expose
JIT-path variance between runs.
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from sig_etl_spark.session import get_spark
from sig_etl_spark.tables import load_table
from sig_etl_spark.llm import similarity as S
from sig_etl_spark.queries import llm_similarity as Q


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf1"
    spark = get_spark()
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    m_subs, ksub, dim = Q._PQ_M, Q._PQ_KSUB, Q._DIM

    t0 = time.monotonic()
    n_corpus = corpus.count()
    print(f"warm_scan     {time.monotonic()-t0:7.2f}s  corpus={n_corpus}")

    t0 = time.monotonic()
    ccodes = S._pq_encode(corpus, "vec_id", "embedding", m_subs, ksub, dim)
    ccodes.count()
    print(f"pq_encode     {time.monotonic()-t0:7.2f}s")

    t0 = time.monotonic()
    full = S.ivfpq_topk(
        queries, corpus, "vec_id", "embedding", k=Q._K,
        n_centroids=Q._N_CENTROIDS, nprobe=Q._IVFPQ_NPROBE,
        m_subs=m_subs, ksub=ksub, dim=dim, shortlist=Q._IVFPQ_SHORTLIST,
    )
    n = full.count()
    print(f"full_query    {time.monotonic()-t0:7.2f}s  rows={n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
