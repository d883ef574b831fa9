"""Phase-level variance diagnosis for llm_embedding_near_dup_ivf
(round 14 — VERDICT r13 task 3: 28-67s across fresh sf1 processes for
three rounds, mechanism undiagnosed).

Splits the operator into its three timed phases, each forced by its own
action, in ONE process so the split is attributable:

  1. corpus count (the adaptive-cell sizing scan)
  2. scoring pass -> assignment localCheckpoint (eager): the
     corpus x centroids broadcast dot-product + per-vid top-nassign
     window, materialized
  3. cell self-join + dedup + exact-cosine verify + final count

Also records stage-level wall times from the status tracker so a
skewed/straggling stage is visible, and the JVM's GC time delta.

Usage: python tools/diag_ivf_variance.py [SF_DIR] [REPEATS]
Prints one JSON line per repeat plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sig_etl_spark.session import get_spark  # noqa: E402
from sig_etl_spark.tables import load_table  # noqa: E402
import sig_etl_spark.llm.similarity as S  # noqa: E402
from sig_etl_spark.queries.llm_similarity import _ND_ASSIGN, _ND_CELL  # noqa: E402


def _jvm_gc_ms(spark) -> float:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return float(sum(beans.get(i).getCollectionTime() for i in range(beans.size())))


def one_run(spark, sf_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    gc0 = _jvm_gc_ms(spark)

    t0 = time.perf_counter()
    n = emb.count()
    t_count = time.perf_counter() - t0

    n_centroids = max(8, n // _ND_CELL)
    cents = S._hash_sample(emb, "vec_id", "embedding", n_centroids, "cent_id", "cent_vec")
    cent_norm = S._with_norm2(cents, "cent_id", "cent_vec", "cent_id").select(
        "cent_id",
        F.col("cent_id_vec").alias("cent_vec"),
        F.col("cent_id_norm2").alias("cent_norm2"),
    )
    e = S._with_norm2(emb, "vec_id", "embedding", "vid")
    scored = e.join(F.broadcast(cent_norm)).select(
        "vid", "vid_vec", "vid_norm2", "cent_id",
        (
            S._double_dot(F.col("vid_vec"), F.col("cent_vec"))
            / F.sqrt(F.col("vid_norm2") * F.col("cent_norm2"))
        ).alias("csim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vid").orderBy(F.desc("csim"), "cent_id")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ND_ASSIGN)
        .select("vid", "vid_vec", "vid_norm2", "cent_id")
    )
    t0 = time.perf_counter()
    assigned = assigned.localCheckpoint()  # eager: forces the scoring pass
    t_score = time.perf_counter() - t0

    a = assigned.select(
        F.col("vid").alias("id_a"), F.col("vid_vec").alias("vec_a"),
        F.col("vid_norm2").alias("norm2_a"), "cent_id",
    )
    b = assigned.select(
        F.col("vid").alias("id_b"), F.col("vid_vec").alias("vec_b"),
        F.col("vid_norm2").alias("norm2_b"), "cent_id",
    )
    cands = a.join(b, "cent_id").filter(F.col("id_a") < F.col("id_b"))
    cos = S._double_dot(F.col("vec_a"), F.col("vec_b")) / F.sqrt(
        F.col("norm2_a") * F.col("norm2_b")
    )
    # mirrors the round-14 production order: score map-side, dedup the
    # skinny survivors (set DIAG_IVF_OLD_ORDER=1 to time the pre-r14
    # dedup-first composition for the contrast)
    if os.environ.get("DIAG_IVF_OLD_ORDER"):
        pairs = (
            cands.dropDuplicates(["id_a", "id_b"])
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= 0.3)
            .select("id_a", "id_b", "cosine")
        )
    else:
        pairs = (
            cands.withColumn("cosine", cos)
            .filter(F.col("cosine") >= 0.3)
            .select("id_a", "id_b", "cosine")
            .dropDuplicates(["id_a", "id_b"])
        )
    t0 = time.perf_counter()
    n_pairs = pairs.count()
    t_join = time.perf_counter() - t0

    gc_ms = _jvm_gc_ms(spark) - gc0
    # release the checkpoint blocks the way the registered query's
    # consumer eventually would
    spark._jvm.System.gc()
    return {
        "corpus": n,
        "n_centroids": n_centroids,
        "pairs": n_pairs,
        "t_count": round(t_count, 2),
        "t_score_checkpoint": round(t_score, 2),
        "t_pair_join": round(t_join, 2),
        "t_total": round(t_count + t_score + t_join, 2),
        "jvm_gc_ms": round(gc_ms, 0),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    for i in range(repeats):
        r = one_run(spark, sf_dir)
        r["repeat"] = i
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
