"""Smoke coverage for tools/bench_streaming.py (round 11): the streaming
throughput bench must run end to end at the tiny scale and emit sane
numbers — without it the tool would bit-rot silently (it is not on the
driver's per-round path the way bench.py is)."""

from __future__ import annotations

import json
import os


def test_stream_bench_smoke(spark, sf_dir, tmp_path, monkeypatch):
    from tools import bench_streaming

    out = tmp_path / "stream_bench.json"
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_STREAM_BENCH_OUT", str(out))
    assert bench_streaming.main() == 0
    rec = json.loads(out.read_text())
    ops = rec["ops"]
    assert set(ops) == {
        "stream_crawl_curation",
        "stream_decontaminate",
        "stream_corpus_near_dup",
        "stream_quality_gate",
        "stream_ivf_assign",
        "stream_dedup",
        # round 14 (VERDICT r13 task 7): the stateful family
        "stateful_sessionize",
        "stream_hll_distinct",
        "stream_kmv_distinct",
        "stream_cms_registers",
        "stream_interval_union",
        "stream_scd2",
    }
    for name, r in ops.items():
        assert r["wall_s"] > 0, name
        assert r["rows_in"] > 0, name
        assert r["rows_in_per_s"] > 0, name
    # decontamination keeps most of the corpus; the gate stream emits one
    # row per ingested record (plus dup pairs in the second sink)
    assert ops["stream_decontaminate"]["rows_out"] > 0
    assert ops["stream_crawl_curation"]["rows_out"] >= ops["stream_crawl_curation"]["rows_in"] * 0.9
