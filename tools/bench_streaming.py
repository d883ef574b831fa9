"""Streaming throughput bench (round 11): availableNow wall-clock for the
continuous operators, measured through the PRODUCTION parquet sink.

The batch bench (bench.py) covers every registered query; the streaming
layer's correctness is pinned by batch-equality tests, but until round 11
it had no recorded THROUGHPUT numbers. This tool stages each operator's
full input in a landing zone up front, then times ONE availableNow
catch-up run end to end (stream planning + micro-batches + distributed
parquet writes — no driver collect anywhere), and reports rows/s.

Usage::

    python tools/bench_streaming.py            # sf0.1 by default
    SPARK_GRAFT_SF_DIR=... python tools/bench_streaming.py

Prints one JSON line and persists it to STREAM_BENCH.json (override with
SPARK_GRAFT_STREAM_BENCH_OUT). Numbers are single-run wall-clock —
availableNow runs are dominated by fixed stream-planning overhead at test
scale, so treat rows/s as a floor, not a steady-state rate.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sig_etl_spark.session import get_spark  # noqa: E402
from sig_etl_spark.tables import load_table  # noqa: E402


def _timed_run(spark, df, ckpt, name, outdir, mode="append"):
    from sig_etl_spark.streaming import run_available_now

    t0 = time.perf_counter()
    paths = run_available_now(
        df, ckpt, name, output_mode=mode, timeout_s=600, output_dir=outdir
    )
    wall = time.perf_counter() - t0
    rows = spark.read.parquet(*paths).count() if paths else 0
    return wall, rows


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = base

    spark = get_spark("sig_etl_spark_stream_bench")
    spark.sparkContext.setLogLevel("ERROR")

    from sig_etl_spark.llm import text_analysis as T
    from sig_etl_spark.queries.extract_demo import wet_crawl_containers
    from sig_etl_spark.queries.llm_dedup import crawl_clean_frame, crawl_gated_frame
    from sig_etl_spark.streaming import (
        collect_bigram_model,
        collect_boilerplate_segments,
        read_document_stream,
        read_warc_stream,
        stream_corpus_near_dup,
        stream_crawl_curation,
        stream_decontaminate,
    )

    work = tempfile.mkdtemp(prefix="stream_bench_")
    results: dict[str, dict] = {}
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # ------------------------------------------------------------------
    # 1. Continuous crawl curation: WARC containers -> WET -> scrub ->
    #    gate -> corpus near-dup (two sinks, timed together — the live
    #    twin of llm_crawl_curation_e2e's front half).
    # ------------------------------------------------------------------
    from sig_etl_spark.queries.extract_demo import wet_text_records

    raw = wet_text_records(spark, sf_dir).select("doc_id", "text")
    boiler = collect_boilerplate_segments(raw)
    model = collect_bigram_model(crawl_clean_frame(spark, sf_dir), "text", k=500)
    corpus = (
        crawl_gated_frame(spark, sf_dir)
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    zone = os.path.join(work, "crawl_zone")
    os.makedirs(zone)
    for r in wet_crawl_containers(spark, sf_dir).collect():
        with open(os.path.join(zone, f"part-{r.container_id}.warc.gz"), "wb") as f:
            f.write(bytes(r.data))
    gate_df, dup_df = stream_crawl_curation(
        read_warc_stream(spark, zone), boiler, model, corpus
    )
    t0 = time.perf_counter()
    from sig_etl_spark.streaming import run_available_now

    gate_paths = run_available_now(
        gate_df,
        os.path.join(work, "gate_ckpt"),
        "bench_gate",
        output_mode="append",
        timeout_s=600,
        output_dir=os.path.join(work, "gate_out"),
    )
    dup_paths = run_available_now(
        dup_df,
        os.path.join(work, "dup_ckpt"),
        "bench_dup",
        output_mode="append",
        timeout_s=600,
        output_dir=os.path.join(work, "dup_out"),
    )
    wall = time.perf_counter() - t0
    gate_rows = spark.read.parquet(*gate_paths).count() if gate_paths else 0
    dup_rows = spark.read.parquet(*dup_paths).count() if dup_paths else 0
    results["stream_crawl_curation"] = {
        "wall_s": round(wall, 3),
        "rows_in": n_docs,
        "rows_out": gate_rows + dup_rows,
        "rows_in_per_s": round(n_docs / wall, 1),
    }

    # ------------------------------------------------------------------
    # 2. Streaming decontamination: parquet doc stream vs static bench.
    # ------------------------------------------------------------------
    fp = docs.select(
        "doc_id", T.fingerprint(F.col("text"), k=3).alias("fingerprint")
    )
    bench = fp.filter(F.col("doc_id") % 97 == 0).select("fingerprint")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    n_train = train.count()
    land = os.path.join(work, "decon_landing")
    train.write.mode("overwrite").parquet(land)
    decon = stream_decontaminate(read_document_stream(spark, land), bench)
    wall, rows = _timed_run(
        spark,
        decon,
        os.path.join(work, "decon_ckpt"),
        "bench_decon",
        os.path.join(work, "decon_out"),
    )
    results["stream_decontaminate"] = {
        "wall_s": round(wall, 3),
        "rows_in": n_train,
        "rows_out": rows,
        "rows_in_per_s": round(n_train / wall, 1),
    }

    # ------------------------------------------------------------------
    # 3. Continuous-ingest corpus near-dup: doc stream vs static corpus.
    # ------------------------------------------------------------------
    land2 = os.path.join(work, "nd_landing")
    docs.write.mode("overwrite").parquet(land2)
    nd = stream_corpus_near_dup(
        read_document_stream(spark, land2), docs, threshold=0.5
    )
    wall, rows = _timed_run(
        spark,
        nd,
        os.path.join(work, "nd_ckpt"),
        "bench_nd",
        os.path.join(work, "nd_out"),
    )
    results["stream_corpus_near_dup"] = {
        "wall_s": round(wall, 3),
        "rows_in": n_docs,
        "rows_out": rows,
        "rows_in_per_s": round(n_docs / wall, 1),
    }

    # ------------------------------------------------------------------
    # 4. Continuous quality gating: doc stream scored statelessly against
    #    the bounded bigram model (the live half of the curation front
    #    end, timed on its own).
    # ------------------------------------------------------------------
    from sig_etl_spark.streaming import stream_quality_gate

    qmodel = collect_bigram_model(docs, "text", k=500)
    land3 = os.path.join(work, "qg_landing")
    docs.write.mode("overwrite").parquet(land3)
    qg = stream_quality_gate(
        read_document_stream(spark, land3), qmodel, text_col="text"
    )
    wall, rows = _timed_run(
        spark,
        qg,
        os.path.join(work, "qg_ckpt"),
        "bench_qg",
        os.path.join(work, "qg_out"),
    )
    results["stream_quality_gate"] = {
        "wall_s": round(wall, 3),
        "rows_in": n_docs,
        "rows_out": rows,
        "rows_in_per_s": round(n_docs / wall, 1),
    }

    # ------------------------------------------------------------------
    # 5. Live IVF index maintenance: embedding stream assigned to the
    #    existing quantizer's cells (the add() path of the ANN index).
    # ------------------------------------------------------------------
    from sig_etl_spark.streaming import (
        collect_ivf_index,
        read_embedding_stream,
        stream_ivf_assign,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_emb = emb.count()
    index = collect_ivf_index(emb, "vec_id", "embedding", n_centroids=64)
    land4 = os.path.join(work, "ivf_landing")
    emb.write.mode("overwrite").parquet(land4)
    ivf = stream_ivf_assign(read_embedding_stream(spark, land4), index, n_cells=1)
    wall, rows = _timed_run(
        spark,
        ivf,
        os.path.join(work, "ivf_ckpt"),
        "bench_ivf",
        os.path.join(work, "ivf_out"),
    )
    results["stream_ivf_assign"] = {
        "wall_s": round(wall, 3),
        "rows_in": n_emb,
        "rows_out": rows,
        "rows_in_per_s": round(n_emb / wall, 1),
    }

    # ------------------------------------------------------------------
    # 6. Streaming exact dedup under redelivery: the events table staged
    #    TWICE (at-least-once delivery), dropDuplicatesWithinWatermark
    #    emits each event_id once — rows_in counts both deliveries.
    # ------------------------------------------------------------------
    from sig_etl_spark.streaming import read_event_stream, stream_dedup

    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    land5 = os.path.join(work, "dedup_landing")
    events.write.mode("overwrite").parquet(land5)
    for fname in os.listdir(land5):
        if fname.endswith(".parquet"):
            shutil.copy(
                os.path.join(land5, fname),
                os.path.join(land5, "redeliver_" + fname),
            )
    dd = stream_dedup(
        read_event_stream(spark, land5),
        key_cols=("event_id",),
        watermark="400 days",
    )
    wall, rows = _timed_run(
        spark,
        dd,
        os.path.join(work, "dedup_ckpt"),
        "bench_dedup",
        os.path.join(work, "dedup_out"),
    )
    results["stream_dedup"] = {
        "wall_s": round(wall, 3),
        "rows_in": 2 * n_events,
        "rows_out": rows,
        "rows_in_per_s": round(2 * n_events / wall, 1),
    }

    # ------------------------------------------------------------------
    # 7-11. The stateful family (round 14 — VERDICT r13 task 7): floors
    # for the applyInPandasWithState / native-stateful-agg operators.
    # All five read the SAME staged events landing (one copy, separate
    # checkpoints); wall-clock includes stream planning + state-store
    # commits + the production parquet sink, like every stanza above.
    # ------------------------------------------------------------------
    from sig_etl_spark.streaming import (
        stateful_sessionize,
        stream_cms_registers,
        stream_hll_distinct,
        stream_interval_union,
        stream_kmv_distinct,
    )

    land_ev = os.path.join(work, "ev_landing")
    events.write.mode("overwrite").parquet(land_ev)

    stateful_ops = [
        # (name, builder over the event stream, output mode)
        (
            "stateful_sessionize",
            lambda s: stateful_sessionize(s, gap_minutes=30, watermark="2 hours"),
            "append",
        ),
        ("stream_hll_distinct", stream_hll_distinct, "update"),
        ("stream_kmv_distinct", stream_kmv_distinct, "update"),
        ("stream_cms_registers", stream_cms_registers, "update"),
        ("stream_interval_union", stream_interval_union, "update"),
    ]
    for op_name, build, mode in stateful_ops:
        df = build(read_event_stream(spark, land_ev))
        wall, rows = _timed_run(
            spark,
            df,
            os.path.join(work, f"{op_name}_ckpt"),
            f"bench_{op_name}",
            os.path.join(work, f"{op_name}_out"),
            mode=mode,
        )
        results[op_name] = {
            "wall_s": round(wall, 3),
            "rows_in": n_events,
            "rows_out": rows,
            "rows_in_per_s": round(n_events / wall, 1),
        }

    # ------------------------------------------------------------------
    # 12. Stateful SCD2 maintenance over the daily snapshot stream (the
    #     live twin of dim_scd2_intervals) — snapshot feed shared with
    #     the batch query's builder so the modal definition lives once.
    # ------------------------------------------------------------------
    from sig_etl_spark.queries.events_demo import scd2_daily_snapshots
    from sig_etl_spark.streaming import read_snapshot_stream, stream_scd2

    snaps = scd2_daily_snapshots(spark, sf_dir).select(
        "user_id", "day", F.col("event_type").alias("attr")
    )
    n_snaps = snaps.count()
    land_sn = os.path.join(work, "snap_landing")
    snaps.write.mode("overwrite").parquet(land_sn)
    scd = stream_scd2(
        read_snapshot_stream(spark, land_sn), watermark="3 days", horizon_days=2
    )
    wall, rows = _timed_run(
        spark,
        scd,
        os.path.join(work, "scd2_ckpt"),
        "bench_scd2",
        os.path.join(work, "scd2_out"),
        mode="append",
    )
    results["stream_scd2"] = {
        "wall_s": round(wall, 3),
        "rows_in": n_snaps,
        "rows_out": rows,
        "rows_in_per_s": round(n_snaps / wall, 1),
    }

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "streaming_availablenow_wall_seconds",
        "unit": "sec",
        "sf": sf,
        "ops": results,
        "note": (
            "single availableNow catch-up run, production parquet sink, "
            "all input staged up front; rows_in_per_s is a floor (fixed "
            "stream-planning overhead dominates at test scale)"
        ),
    }
    line = json.dumps(out)
    print(line)
    dest = os.environ.get("SPARK_GRAFT_STREAM_BENCH_OUT", "STREAM_BENCH.json")
    with open(dest, "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
