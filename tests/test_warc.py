"""WARC container ingestion tests (round 9): record codec units, the
gzip-member walker, the Spark render->parse roundtrip, and the
production binaryFile entry over a written fixture zone."""

from __future__ import annotations

import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sig_etl_spark.extract import warc


# ---------------------------------------------------------------------------
# Pure codec units (no Spark).
# ---------------------------------------------------------------------------

def test_record_roundtrip():
    rec = warc.build_record(42, "héllo wörld".encode("utf-8"))
    out = warc.parse_record(rec)
    assert out["doc_id"] == 42
    assert out["target_uri"] == "https://example.org/docs/42"
    assert out["warc_type"] == "response"
    assert out["payload"].decode("utf-8") == "héllo wörld"
    assert out["content_length"] == len("héllo wörld".encode("utf-8"))


def test_payload_may_contain_header_terminator():
    """Content-Length framing, not delimiter scanning: a payload that
    embeds CRLFCRLF must survive intact."""
    payload = b"a\r\n\r\nb\r\n\r\nc"
    out = warc.parse_record(warc.build_record(1, payload))
    assert out["payload"] == payload


def test_empty_payload():
    out = warc.parse_record(warc.build_record(7, b""))
    assert out["payload"] == b"" and out["content_length"] == 0


def test_member_is_deterministic_gzip():
    m1 = warc.build_member(5, b"abc")
    m2 = warc.build_member(5, b"abc")
    assert m1 == m2  # mtime=0, fixed level
    assert m1[:2] == b"\x1f\x8b"
    assert gzip.decompress(m1) == warc.build_record(5, b"abc")


def test_iter_members_walks_concatenation():
    blob = b"".join(warc.build_member(i, f"doc {i}".encode()) for i in range(5))
    recs = [warc.parse_record(m) for m in warc.iter_members(blob)]
    assert [r["doc_id"] for r in recs] == list(range(5))


def test_iter_members_rejects_garbage_boundary():
    with pytest.raises(ValueError, match="boundary"):
        list(warc.iter_members(b"not gzip"))


def test_iter_members_rejects_truncated_member():
    m = warc.build_member(1, b"x" * 1000)
    with pytest.raises(ValueError, match="truncated"):
        list(warc.iter_members(m[: len(m) // 2]))


def test_parse_record_rejects_bad_version():
    with pytest.raises(ValueError, match="version"):
        warc.parse_record(b"WARC/9.9\r\n\r\n")


def test_iter_records_uncompressed_variant():
    blob = b"".join(warc.build_record(i, f"p{i}".encode()) for i in range(4))
    recs = list(warc.iter_records(blob, compressed=False))
    assert [r["doc_id"] for r in recs] == list(range(4))
    assert all(r["payload"] == f"p{r['doc_id']}".encode() for r in recs)


# ---------------------------------------------------------------------------
# Spark roundtrip + production entry.
# ---------------------------------------------------------------------------

def test_spark_render_parse_roundtrip(spark, sf_dir):
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
    )
    n_docs = docs.count()
    out = warc.parse_containers(warc.render_containers(docs, n_containers=4))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == n_docs
    src = {r.doc_id: r.text for r in docs.collect()}
    for did, text in src.items():
        assert rows[did].payload == text
        assert rows[did].container_id == did % 4
        assert rows[did].content_length == len(text.encode("utf-8"))


def test_spark_uncompressed_roundtrip(spark, sf_dir):
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text").limit(20)
    )
    out = warc.parse_containers(
        warc.render_containers(docs, n_containers=2, compressed=False),
        compressed=False,
    )
    assert out.count() == 20


def test_read_warc_zone_binaryfile_entry(spark, tmp_path):
    """The production path: real .warc.gz files on disk, binaryFile scan,
    one row per record; decoy extensions pruned by the glob."""
    zone = tmp_path / "zone"
    zone.mkdir()
    expect = {}
    for c in range(3):
        members = b""
        for i in range(10):
            did = c * 100 + i
            payload = f"container {c} doc {i} ünicode".encode("utf-8")
            members += warc.build_member(did, payload)
            expect[did] = payload.decode("utf-8")
        (zone / f"part-{c}.warc.gz").write_bytes(members)
    (zone / "README.txt").write_text("decoy — must be pruned")

    out = warc.read_warc_zone(spark, str(zone)).collect()
    assert len(out) == 30
    got = {r.doc_id: r.payload for r in out}
    assert got == expect
    # container identity: rows from one file share a container_id
    by_file = {}
    for r in out:
        by_file.setdefault(r.doc_id // 100, set()).add(r.container_id)
    assert all(len(v) == 1 for v in by_file.values())
    assert len({next(iter(v)) for v in by_file.values()}) == 3
