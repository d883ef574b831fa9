"""WARC-style container ingestion (round 9 — VERDICT r8 task 6).

Web-crawl training corpora land on disk as WARC containers (ISO 28500;
the Common Crawl shape): one file = thousands of records, each record a
header block + payload, and in the ``.warc.gz`` variant each record is
its OWN gzip member so readers can split on member boundaries without
decompressing the whole file. This module implements the full path with
the Python stdlib only (``zlib`` handles gzip members — no gating
needed, unlike the image/audio codecs):

    binaryFile landing scan (one container = one row = one task)
      -> mapInPandas gzip-member walker (zlib.decompressobj(wbits=31),
         loop on .unused_data — each member decodes independently,
         memory bounded by ONE record, not the container)
      -> WARC header parse (version line + colon headers +
         Content-Length-delimited payload)
      -> one output row per record.

Scale shape: exactly how Spark jobs consume Common Crawl — containers
are ~1 GB each, millions of them; ``binaryFile`` gives one task per
container, the walker streams members, and no driver involvement exists
anywhere. The oracle-checked registry query renders containers
IN-ENGINE from the documents table (the driver harness is parquet-only
— same render-then-parse roundtrip pattern as extract_s3_roundtrip) so
any walker/parser defect breaks the value hash; ``read_warc_zone`` is
the production entry over a real landing directory, pytest-covered via
a written fixture.

Reference parity: the reference's S2 cache scan (votervoice/extract.py)
walks a directory of saved HTML; WARC is the same landing-zone contract
at web-crawl scale (north-star scope, no direct reference analogue).
"""

from __future__ import annotations

import gzip
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

WARC_VERSION = b"WARC/1.0"

# One output row per WARC record.
RECORD_SCHEMA = (
    "container_id bigint, doc_id bigint, target_uri string,"
    " warc_type string, content_length bigint, payload string"
)


# ---------------------------------------------------------------------------
# Record-level codec (pure functions — unit-testable off-cluster).
# ---------------------------------------------------------------------------

def build_record(
    doc_id: int,
    payload: bytes,
    uri: str | None = None,
    content_type: str = "text/plain",
) -> bytes:
    """Serialize one WARC/1.0 response record (uncompressed). Real crawl
    response records carry ``content_type='application/http;
    msgtype=response'`` with a full HTTP response as the payload — the
    WET composition renders exactly that shape."""
    uri = uri or f"https://example.org/docs/{doc_id}"
    headers = (
        WARC_VERSION + b"\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
    )
    return headers + payload + b"\r\n\r\n"


def build_member(
    doc_id: int,
    payload: bytes,
    uri: str | None = None,
    content_type: str = "text/plain",
) -> bytes:
    """One record as its own deterministic gzip member (mtime=0, fixed
    level — byte-stable across runs, the .warc.gz on-disk shape)."""
    return gzip.compress(
        build_record(doc_id, payload, uri, content_type), compresslevel=9, mtime=0
    )


def build_http_response(body: bytes, content_type: str = "text/html") -> bytes:
    """The HTTP/1.1 response envelope a crawl response record stores as
    its WARC payload (status line + headers + CRLFCRLF + body)."""
    return (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}; charset=utf-8\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
        + body
    )


def parse_record(rec: bytes) -> dict:
    """Parse one uncompressed WARC record into a field dict."""
    head, sep, rest = rec.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("WARC record without header terminator")
    lines = head.split(b"\r\n")
    # any WARC/1.x revision (1.0 and 1.1 crawls are both in the wild and
    # differ only in headers this parser ignores)
    if not lines[0].startswith(b"WARC/1."):
        raise ValueError(f"unsupported WARC version line: {lines[0]!r}")
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        # header names/values are spec-ASCII/UTF-8, but real crawls carry
        # mojibake — replace, never crash the container task
        headers[
            k.strip().decode("ascii", errors="replace").lower()
        ] = v.strip().decode("utf-8", errors="replace")
    n = int(headers["content-length"])
    payload = rest[:n]
    if len(payload) != n:
        raise ValueError("truncated WARC payload")
    rid = headers.get("warc-record-id", "")
    # standard record IDs are <urn:uuid:...> — non-numeric tails fall
    # back to -1 instead of raising. Canonical-form regex, not bare
    # int(): int() both REJECTS digit-shaped strings ('--5', unicode
    # digit-likes such as '²' — ValueError would kill the task) and
    # ACCEPTS non-canonical ones ('+7', '1_000', ' 7 ') that would
    # silently collide with real ids; only an exact [-]digits tail is an
    # id, everything else is -1. ASCII class, not \d: Unicode-aware \d
    # matches non-ASCII decimal digits (e.g. Arabic-Indic '٧') and
    # int('٧') == 7, which would silently collide with a real doc id.
    tail = rid.rsplit(":", 1)[-1].rstrip(">") if ":" in rid else ""
    doc_id = int(tail) if re.fullmatch(r"-?[0-9]+", tail) else -1
    return {
        "doc_id": doc_id,
        "target_uri": headers.get("warc-target-uri", ""),
        "warc_type": headers.get("warc-type", ""),
        "content_length": n,
        "payload": payload,
    }


def iter_members(data: bytes) -> Iterator[bytes]:
    """Walk concatenated gzip members: decompress one member at a time
    via zlib.decompressobj(wbits=31) and resume at .unused_data — only
    ONE decoded record is held at a time (the compressed container bytes
    are already materialized by the binaryFile scan)."""
    buf = data
    while buf:
        if buf[:2] != b"\x1f\x8b":
            raise ValueError("not a gzip member boundary")
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(buf)  # stops at THIS member's end; rest -> unused_data
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield out
        buf = d.unused_data


def iter_records(data: bytes, compressed: bool = True) -> Iterator[dict]:
    """All records in a container (compressed = per-member gzip)."""
    if compressed:
        for member in iter_members(data):
            yield parse_record(member)
    else:
        rest = data
        while rest:
            rec = parse_record(rest)
            head_len = rest.index(b"\r\n\r\n") + 4
            consumed = head_len + rec["content_length"] + 4
            yield rec
            rest = rest[consumed:]


# ---------------------------------------------------------------------------
# Spark plumbing.
# ---------------------------------------------------------------------------

def render_containers(
    docs: DataFrame,
    n_containers: int = 8,
    doc_id: str = "doc_id",
    text: str = "text",
    compressed: bool = True,
    content_type: str = "text/plain",
) -> DataFrame:
    """(container_id, data): documents grouped into deterministic WARC
    containers — record bytes built per row in an Arrow batch, members
    concatenated in doc_id order with a binary aggregate fold (JVM-side;
    the Python step touches each record once). Pass
    ``content_type='application/http; msgtype=response'`` with
    HTTP-enveloped text for the real crawl response shape."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    build = build_member if compressed else build_record

    @pandas_udf("binary")
    def _member(ids, texts):
        return pd.Series(
            [
                build(int(i), t.encode("utf-8"), None, content_type)
                for i, t in zip(ids, texts)
            ]
        )

    return (
        docs.select(
            (F.col(doc_id) % n_containers).alias("container_id"),
            F.col(doc_id).alias("_id"),
            _member(F.col(doc_id), F.col(text)).alias("member"),
        )
        .groupBy("container_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_id", "member"))
            ).alias("members")
        )
        .select(
            "container_id",
            F.aggregate(
                F.col("members"),
                F.lit(b""),
                lambda acc, m: F.concat(acc, m["member"]),
            ).alias("data"),
        )
    )


def parse_containers(
    containers: DataFrame,
    container_id: str = "container_id",
    data: str = "data",
    compressed: bool = True,
    errors: str = "strict",
) -> DataFrame:
    """mapInPandas walker: one input row per container, one output row
    per WARC record. Arrow-batched; payloads decode utf-8. The in-engine
    render->parse roundtrip oracle keeps ``errors='strict'`` (a decode
    defect must break the hash); the production landing-zone entry
    passes ``errors='replace'`` because arbitrary crawl bytes are not
    guaranteed UTF-8."""

    def _walk(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for cid, blob in zip(pdf[container_id], pdf[data]):
                for rec in iter_records(bytes(blob), compressed=compressed):
                    rows.append(
                        (
                            int(cid),
                            rec["doc_id"],
                            rec["target_uri"],
                            rec["warc_type"],
                            rec["content_length"],
                            rec["payload"].decode("utf-8", errors=errors),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "container_id", "doc_id", "target_uri",
                    "warc_type", "content_length", "payload",
                ],
            )

    return containers.mapInPandas(_walk, RECORD_SCHEMA)


def http_body(payload):
    """WET step 1, as pure column algebra: the body of an HTTP response
    payload (everything after the first CRLFCRLF), or the payload
    unchanged when no HTTP envelope is present. JVM-side — stripping
    headers from billions of records must not round-trip through
    Python."""
    sep = F.instr(payload, "\r\n\r\n")
    return F.when(
        (sep > 0) & payload.startswith("HTTP/"),
        F.substring(payload, sep + 4, F.length(payload)),
    ).otherwise(payload)


def read_warc_zone(spark, path: str, glob: str = "*.warc.gz") -> DataFrame:
    """Production entry: binaryFile scan of a WARC landing zone (one
    container file = one split = one walker task), record rows out.
    container_id is the file-path hash (stable per container)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.xxhash64(F.col("path")).alias("container_id"),
            F.col("content").alias("data"),
        )
    )
    return parse_containers(raw, compressed=glob.endswith(".gz"), errors="replace")
