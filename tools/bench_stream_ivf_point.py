"""One-op streaming floor: stream_ivf_assign at an arbitrary fixture.

The full tools/bench_streaming.py needs every table (events, documents);
scale fixtures generated with --only documents,embeddings (e.g. sf3, the
round-14 third decade) can still measure the IVF-assign floor through
this single stanza — same staging, same production parquet sink, same
rows_in/s definition as the full tool.

Usage: python tools/bench_stream_ivf_point.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sig_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf3"
    spark = get_spark("sig_etl_spark_stream_ivf_point")
    spark.sparkContext.setLogLevel("ERROR")
    from sig_etl_spark.streaming import (
        collect_ivf_index,
        read_embedding_stream,
        run_available_now,
        stream_ivf_assign,
    )

    work = tempfile.mkdtemp(prefix="stream_ivf_point_")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_emb = emb.count()
    index = collect_ivf_index(emb, "vec_id", "embedding", n_centroids=64)
    land = os.path.join(work, "landing")
    emb.write.mode("overwrite").parquet(land)
    ivf = stream_ivf_assign(read_embedding_stream(spark, land), index, n_cells=1)
    t0 = time.perf_counter()
    paths = run_available_now(
        ivf,
        os.path.join(work, "ckpt"),
        "ivf_point",
        output_mode="append",
        timeout_s=600,
        output_dir=os.path.join(work, "out"),
    )
    wall = time.perf_counter() - t0
    rows = spark.read.parquet(*paths).count() if paths else 0
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "op": "stream_ivf_assign",
                "sf_dir": sf_dir,
                "wall_s": round(wall, 3),
                "rows_in": n_emb,
                "rows_out": rows,
                "rows_in_per_s": round(n_emb / wall, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
