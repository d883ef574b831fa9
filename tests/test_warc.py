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


def test_parse_record_accepts_warc_11():
    """Real crawls ship WARC/1.1; any 1.x revision parses."""
    rec = warc.build_record(3, b"pay")
    rec11 = rec.replace(b"WARC/1.0", b"WARC/1.1", 1)
    out = warc.parse_record(rec11)
    assert out["doc_id"] == 3 and out["payload"] == b"pay"


def test_parse_record_uuid_record_id_falls_back():
    """Standard record IDs are <urn:uuid:...> — a non-numeric tail must
    yield doc_id=-1, not a ValueError."""
    rec = warc.build_record(9, b"x")
    rec = rec.replace(
        b"WARC-Record-ID: <urn:doc:9>",
        b"WARC-Record-ID: <urn:uuid:0f84f1f4-2f3a-4f5f-9e1e-abc123def456>",
    )
    out = warc.parse_record(rec)
    assert out["doc_id"] == -1 and out["payload"] == b"x"


@pytest.mark.parametrize(
    "tail",
    [b"--5", "²".encode(), "٧".encode(), b"+ 7", b"", b"+7", b"1_000", b" 7 "],
    ids=[
        "double-dash",
        "unicode-superscript",
        "arabic-indic-digit",
        "spaced-sign",
        "empty",
        "plus-sign",
        "underscore-separator",
        "padded",
    ],
)
def test_parse_record_digit_shaped_tails_fall_back(tail):
    """Non-canonical id tails must take the -1 fallback — BOTH classes:
    digit-shaped strings int() rejects ('--5', unicode digit-likes such
    as '²' — a bare int() would ValueError-kill the container task) AND
    strings int() accepts but that are not canonical ids ('+7', '1_000',
    ' 7 ' — a bare int() would silently collide with real doc ids)."""
    rec = warc.build_record(9, b"x")
    rec = rec.replace(
        b"WARC-Record-ID: <urn:doc:9>", b"WARC-Record-ID: <urn:x:" + tail + b">"
    )
    out = warc.parse_record(rec)
    assert out["doc_id"] == -1 and out["payload"] == b"x"


def test_parse_record_non_utf8_header_value_replaces():
    """A mojibake header value (raw latin-1 in WARC-Target-URI) must not
    crash the parse — decode with replacement characters."""
    rec = warc.build_record(4, b"pay", uri="PLACEHOLDER")
    rec = rec.replace(b"PLACEHOLDER", b"https://example.org/caf\xe9")
    out = warc.parse_record(rec)
    assert out["doc_id"] == 4
    assert "caf" in out["target_uri"] and "�" in out["target_uri"]


def test_read_warc_zone_non_utf8_payload(spark, tmp_path):
    """Arbitrary crawl bytes are not UTF-8: the production entry decodes
    with errors='replace' instead of crashing the task."""
    zone = tmp_path / "zone_bin"
    zone.mkdir()
    raw = b"\xff\xfe latin1 caf\xe9"
    (zone / "p.warc.gz").write_bytes(warc.build_member(1, raw))
    out = warc.read_warc_zone(spark, str(zone)).collect()
    assert len(out) == 1
    assert out[0].content_length == len(raw)
    assert "�" in out[0].payload  # replacement chars, not an exception


def test_iter_records_uncompressed_variant():
    blob = b"".join(warc.build_record(i, f"p{i}".encode()) for i in range(4))
    recs = list(warc.iter_records(blob, compressed=False))
    assert [r["doc_id"] for r in recs] == list(range(4))
    assert all(r["payload"] == f"p{r['doc_id']}".encode() for r in recs)


def test_record_roundtrip_property():
    """Property (hypothesis): ANY payload bytes — including embedded
    CRLFCRLF, gzip magic, NULs — and any doc id survive
    build_record -> parse_record and the gzip-member walk bit-exactly.
    Content-Length framing means no byte sequence can confuse the
    parser."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        doc_id=st.integers(min_value=-(2**62), max_value=2**62),
        payload=st.binary(max_size=512),
    )
    def check(doc_id: int, payload: bytes):
        rec = warc.build_record(doc_id, payload)
        out = warc.parse_record(rec)
        assert out["doc_id"] == doc_id
        assert out["payload"] == payload
        assert out["content_length"] == len(payload)
        member = warc.build_member(doc_id, payload)
        walked = list(warc.iter_members(member))
        assert walked == [rec]

    check()


def test_container_walk_property():
    """Property: any sequence of (id, payload) records concatenated as
    gzip members walks back in order with payloads intact — including
    payloads that START with the gzip magic bytes."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        recs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**9),
                st.binary(max_size=128),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def check(recs):
        blob = b"".join(warc.build_member(i, p) for i, p in recs)
        out = list(warc.iter_records(blob))
        assert [(r["doc_id"], r["payload"]) for r in out] == recs

    check()


def test_http_envelope_roundtrip_property():
    """Property: build_http_response(body) always yields its body back
    through the CRLFCRLF split — even when the body itself contains
    CRLFCRLF or looks like an HTTP response."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=100, deadline=None)
    @given(body=st.binary(max_size=256))
    def check(body: bytes):
        resp = warc.build_http_response(body)
        _, _, got = resp.partition(b"\r\n\r\n")
        assert got == body

    check()


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


def test_http_response_envelope_units():
    body = "<html><body>x</body></html>".encode()
    resp = warc.build_http_response(body)
    assert resp.startswith(b"HTTP/1.1 200 OK\r\n")
    head, _, got = resp.partition(b"\r\n\r\n")
    assert got == body
    assert f"Content-Length: {len(body)}".encode() in head


def test_wet_golden_fixture(spark, tmp_path):
    """WARC->WET golden fixture: real .warc.gz files whose records are
    HTTP responses with HTML-table bodies (the crawl response shape,
    including a WARC/1.1 + urn:uuid record), recovered end-to-end via
    read_warc_zone -> http_body column strip -> the S3 table parse."""
    from sig_etl_spark.extract import extract_records, stabilize_columns

    zone = tmp_path / "wet_zone"
    zone.mkdir()
    expect = {}
    members = b""
    for i in range(4):
        html = (
            "<html><body><table><thead><tr><th>lang</th><th>body</th></tr>"
            f"</thead><tbody><tr><td>en</td><td>wet doc {i} text</td></tr>"
            "</tbody></table></body></html>"
        ).encode()
        rec = warc.build_record(
            i, warc.build_http_response(html),
            content_type="application/http; msgtype=response",
        )
        if i == 3:  # exercise the WARC/1.1 + uuid robustness path
            rec = rec.replace(b"WARC/1.0", b"WARC/1.1", 1).replace(
                b"<urn:doc:3>", b"<urn:uuid:aaaa-bbbb>"
            )
        members += gzip.compress(rec, compresslevel=9, mtime=0)
        expect[i if i != 3 else -1] = f"wet doc {i} text"
    (zone / "crawl.warc.gz").write_bytes(members)

    recs = warc.read_warc_zone(spark, str(zone))
    pages = recs.select(
        "doc_id", warc.http_body(F.col("payload")).alias("html")
    )
    flat = stabilize_columns(
        extract_records(pages, parser="table"), keys=["lang", "body"]
    )
    got = {r.doc_id: r.body for r in flat.collect()}
    assert got == expect
    assert {r.lang for r in flat.collect()} == {"en"}


def test_http_body_passthrough_without_envelope(spark):
    """http_body leaves non-HTTP payloads untouched (plain-text WARC
    records keep working through the same column)."""
    df = spark.createDataFrame(
        [("plain text, no envelope",), ("HTTP/1.1 200 OK\r\nA: b\r\n\r\nreal body",)],
        ["payload"],
    )
    got = [r.b for r in df.select(warc.http_body(F.col("payload")).alias("b")).collect()]
    assert got == ["plain text, no envelope", "real body"]


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


def test_wet_chain_survives_html_special_text(spark, tmp_path):
    """Document text containing HTML-special sequences ('</td>', '<x>',
    '&amp;', bare '&') must round-trip the full WET chain bit-exactly:
    the render entity-escapes embedded cells and the S3 parse UDF's
    convert_charrefs decode is the exact inverse (ADVICE r10)."""
    from sig_etl_spark.queries.extract_demo import wet_text_records

    nasty = [
        (1, "closing </td> mid-cell & more", "e<n", "s&p"),
        (2, "a &amp; b keeps its literal entity text", "en", "<hr>"),
        (3, "tags <table><tr><td>nested</td></tr></table> inline", "en", "src"),
        (4, "plain text stays plain", "fr", "web"),
    ]
    docs = spark.createDataFrame(nasty, ["doc_id", "text", "lang", "source"])
    d = tmp_path / "wet_special"
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = {
        r.doc_id: (r.text, r.lang, r.source)
        for r in wet_text_records(spark, str(d)).collect()
    }
    assert got == {i: (t, l, s) for i, t, l, s in nasty}
