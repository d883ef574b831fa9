"""Stage-split reconstruction of ivfpq_topk at sf1 — mirrors the body of
sig_etl_spark/llm/similarity.py:ivfpq_topk stage by stage with count()
barriers, so the 15-19s total decomposes into named stages. Each barrier
recomputes its full lineage (no cache), so stage N's time includes its
inputs; the deltas still localize the hot stage.
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
    id_col, vec_col = "vec_id", "embedding"
    n_centroids, nprobe = Q._N_CENTROIDS, Q._IVFPQ_NPROBE
    m_subs, ksub, dim = Q._PQ_M, Q._PQ_KSUB, Q._DIM
    shortlist, k = Q._IVFPQ_SHORTLIST, Q._K

    corpus.count()  # warm the scan

    def t(label, df):
        t0 = time.monotonic()
        n = df.count()
        print(f"{label:18s} {time.monotonic()-t0:7.2f}s  rows={n}")
        return df

    cents = S._hash_sample(
        corpus, id_col, vec_col, n_centroids, "cent_id", "cent_vec"
    ).select(
        "cent_id", "cent_vec",
        S._double_dot(F.col("cent_vec"), F.col("cent_vec")).alias("cent_norm2"),
    )
    cents_arr = cents.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("cent_id", "cent_vec", "cent_norm2"))
        ).alias("cents")
    )
    t("cents_arr", cents_arr)

    def _cell_pick(vec_col_name):
        vnorm = S._double_dot(F.col(vec_col_name), F.col(vec_col_name))
        return F.array_min(
            F.transform(
                "cents",
                lambda ct: F.struct(
                    (
                        -S._double_dot(F.col(vec_col_name), ct["cent_vec"])
                        / F.sqrt(vnorm * ct["cent_norm2"])
                    ).alias("negsim"),
                    ct["cent_id"].alias("cent_id"),
                ),
            )
        )

    ccodes0 = S._pq_encode(corpus, id_col, vec_col, m_subs, ksub, dim)
    t("pq_encode", ccodes0)

    cell_of_corpus = (
        corpus.select(
            F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cvec")
        )
        .crossJoin(F.broadcast(cents_arr))
        .select("corpus_id", _cell_pick("cvec")["cent_id"].alias("cent_id"))
    )
    t("cell_of_corpus", cell_of_corpus)

    ccodes = ccodes0.join(cell_of_corpus, "corpus_id")
    t("ccodes_join", ccodes)

    qlut = S._pq_luts(queries, corpus, id_col, vec_col, m_subs, ksub, dim)
    t("qlut", qlut)

    qbase = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).crossJoin(F.broadcast(cents_arr))
    probes = qbase.select(
        "query_id",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.transform(
                            "cents",
                            lambda ct: F.struct(
                                (
                                    -S._double_dot(F.col("qvec"), ct["cent_vec"])
                                    / F.sqrt(
                                        S._double_dot(F.col("qvec"), F.col("qvec"))
                                        * ct["cent_norm2"]
                                    )
                                ).alias("negsim"),
                                ct["cent_id"].alias("cent_id"),
                            ),
                        )
                    ),
                    1,
                    nprobe,
                ),
                lambda s: s["cent_id"],
            )
        ).alias("cent_id"),
    )
    qside = probes.join(F.broadcast(qlut), "query_id")
    t("qside", qside)

    pairs = ccodes.join(F.broadcast(qside), "cent_id")
    t("pairs", pairs)

    short = S._topk_by_cosine(S._adc_scored(pairs, m_subs), shortlist)
    t("short", short)

    full = S._exact_rerank(short, queries, corpus, id_col, vec_col, k)
    t("full", full)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
