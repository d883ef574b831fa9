"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery here is real and tested — schemas, Arrow batch
shapes, mapInPandas signatures, frame explosion, partitioning. The codec
layer is tiered: REAL stdlib decoders for binary PPM (P6), non-interlaced
8-bit PNG (zlib inflate + filter reversal, CRC-checked) and baseline
4:4:4 JPEG (Huffman entropy decode + IDCT), PIL for everything else when
importable, and an honest NotImplementedError for formats neither covers
(this container ships no image/audio libraries). The byte-statistics featurizer (``_decode_bytes``)
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
    DoubleType,
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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81) — pure stdlib/numpy codec, closing the last
# DCT-format gap behind decode_real. Decoder: full marker walk (APPn/COM
# skipped, DQT/DHT/SOF0/DRI/SOS parsed), canonical Huffman tables built
# from DHT exactly as Annex C specifies, DC DPCM + AC run-length entropy
# decode with byte destuffing and RSTn restart handling, dequantization,
# de-zigzag, orthonormal 8x8 IDCT, level shift, and JFIF YCbCr->RGB for
# 3-component scans. Supported subset: 8-bit baseline sequential (SOF0),
# 1 or 3 components, 4:4:4 (all sampling factors 1). Progressive (SOF2),
# subsampled chroma, 12-bit, and arithmetic coding raise honestly.
# Encoder twin builds real streams (standard Annex K Huffman tables) for
# fixtures/tests: from pixels (pad -> DCT -> quantize -> entropy) or
# straight from integer coefficient blocks (exact entropy-layer tests).
# ---------------------------------------------------------------------------

_ZIGZAG = [
    (i, s - i) if s % 2 else (s - i, i)
    for s in range(15)
    for i in range(max(0, s - 7), min(7, s) + 1)
]
# _ZIGZAG[k] = (row, col) of the k-th coefficient in zigzag order; the
# comprehension walks each anti-diagonal alternating direction (T.81 Fig 5).
_ZZFLAT = [r * 8 + c for (r, c) in _ZIGZAG]  # k -> flat 8x8 index

# Annex K.3 "typical" luminance Huffman tables (the libjpeg defaults —
# using them means real-world baseline files entropy-decode too).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


_DCT_T: np.ndarray | None = None


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T @ B @ T.T,
    inverse B = T.T @ F @ T — the basis T.81's FDCT/IDCT define.
    Computed once per process (round 15)."""
    global _DCT_T
    if _DCT_T is None:
        x = np.arange(8)
        T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
        T[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
        _DCT_T = T
    return _DCT_T


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        """Pad to byte boundary with 1-bits (T.81 F.1.2.3)."""
        while self.n:
            self.put(1, 1)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 destuffing;
    stops (raises _Marker) when a real marker interrupts the stream."""

    class Marker(Exception):
        def __init__(self, marker: int) -> None:
            self.marker = marker

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy data at 0xFF")
                m = self.data[self.pos]
                self.pos += 1
                if m != 0x00:  # a real marker, not a stuffed byte
                    raise _BitReader.Marker(m)
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0

    def expect_rst(self, idx: int) -> None:
        """Consume the RSTn marker that must follow a restart interval."""
        self.align()
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("missing restart marker")
        m = self.data[self.pos + 1]
        if m != 0xD0 + (idx & 7):
            raise ValueError(
                f"bad restart marker: want RST{idx & 7}, got 0x{m:02X}"
            )
        self.pos += 2


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG entropy data")


# ---------------------------------------------------------------------------
# Fast entropy decode (round 15): the per-BIT Python reader above costs
# length+size method calls per coefficient; the scan below replaces it
# with (a) one numpy-built peek-16 lookup table per Huffman table
# (prefix-expanded canonical codes: lut[16-bit window] = length<<8|sym),
# (b) an int accumulator refilled a byte at a time over the destuffed
# entropy segment, ~3 Python ops per symbol, and (c) batch de-zigzag /
# dequantization with one fancy-index assignment per component instead
# of a 64-step Python loop per block. Bit-exactness is pinned by the
# round-trip/corruption tests; error semantics mirror the per-bit
# reader: reading past the segment raises ValueError (end of data) or
# _BitReader.Marker (a real marker interrupted the stream).
# ---------------------------------------------------------------------------

# Decode tables are cached by the raw DHT segment bytes (fixtures share
# the Annex K tables, so canonical-code expansion and the 65536-entry
# LUT build run once per worker, not once per image).
_DHT_CACHE: dict[bytes, tuple[dict[tuple[int, int], int], list[int]]] = {}


def _dht_tables(raw: bytes, bits: list[int], vals: list[int]):
    """(decode_dict, peek16_lut) for one DHT table, cached by its raw
    segment bytes."""
    entry = _DHT_CACHE.get(raw)
    if entry is None:
        if len(_DHT_CACHE) > 64:
            _DHT_CACHE.clear()
        dec = {
            (length, code): sym
            for sym, (code, length) in _huff_codes(bits, vals).items()
        }
        arr = np.zeros(1 << 16, dtype=np.int32)
        for (length, code), sym in dec.items():
            start = code << (16 - length)
            arr[start : start + (1 << (16 - length))] = (length << 8) | sym
        entry = (dec, arr.tolist())
        _DHT_CACHE[raw] = entry
    return entry


def _entropy_segments(content: bytes, start: int) -> list[tuple[bytes, int | None]]:
    """Destuff the entropy-coded stream into restart-delimited segments:
    [(destuffed_bytes, terminating_marker_or_None)]. 0xFF00 -> literal
    0xFF; RSTn markers split segments; any other marker (or end of
    input) terminates the scan. A trailing lone 0xFF is excluded from
    the data (the per-bit reader errored only when it tried to READ it,
    which the cursor arithmetic reproduces)."""
    segs: list[tuple[bytes, int | None]] = []
    parts: list[bytes] = []
    i, n = start, len(content)
    while True:
        j = content.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            parts.append(content[i : j if j >= 0 else n])
            segs.append((b"".join(parts), None))
            return segs
        m = content[j + 1]
        if m == 0x00:  # stuffed data byte
            parts.append(content[i : j + 1])
            i = j + 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            parts.append(content[i:j])
            segs.append((b"".join(parts), m))
            parts = []
            i = j + 2
        else:  # real marker ends the entropy stream
            parts.append(content[i:j])
            segs.append((b"".join(parts), m))
            return segs


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map a `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v else 0


def _parse_jpeg(content: bytes):
    """Shared parse: markers + entropy decode. Returns (w, h, comps,
    coeff_blocks) where coeff_blocks[i] is an int32 array
    (blocks_y, blocks_x, 8, 8) of DEQUANTIZED, de-zigzagged coefficients
    for component i."""
    import struct

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[dict, list]] = {}
    frame = None  # (w, h, [(comp_id, tq)])
    restart_interval = 0
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM / RSTn: no segment
            continue
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no SOS scan before EOI")
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        body = content[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                vals = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                if len(vals) != 64:
                    raise ValueError("truncated DQT table")
                q = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = int(vals[k])
                qtables[tq] = q
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(body[p + 17 : p + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("truncated DHT table")
                htables[(tc, th)] = _dht_tables(
                    bytes(body[p : p + 17 + nvals]), bits, vals
                )
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError(f"only 8-bit baseline supported (got {prec})")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only); "
                        f"component {cid} has sampling 0x{hv:02X}"
                    )
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("SOS before SOF0")
            w, h, comps = frame
            ns = body[0]
            if ns != len(comps):
                raise ValueError("interleave subset scans unsupported")
            scan_tabs = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                td, ta = tdta >> 4, tdta & 0x0F
                if (0, td) not in htables or (1, ta) not in htables:
                    raise ValueError("SOS references missing Huffman table")
                scan_tabs.append((htables[(0, td)], htables[(1, ta)]))
            bx, by = (w + 7) // 8, (h + 7) // 8
            for _, tq in comps:
                if tq not in qtables:
                    raise ValueError(f"missing quantization table {tq}")
            luts = [
                (dc_tab[1], ac_tab[1]) for dc_tab, ac_tab in scan_tabs
            ]
            segs = _entropy_segments(content, pos + seglen)
            seg_i = 0
            data, term = segs[0]
            dlen = len(data)
            limit = dlen * 8
            bytepos = acc = nacc = used = 0
            ncomp_scan = len(comps)
            preds = [0] * ncomp_scan
            blocks: list[list[list[int]]] = [[] for _ in comps]
            mcu = 0
            for _yb in range(by):
                for _xb in range(bx):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        # inline expect_rst over the segment model: align,
                        # then the segment must be exactly exhausted and
                        # terminated by the right RSTn
                        idx = mcu // restart_interval - 1
                        drop = (bytepos * 8 - used) % 8
                        used += drop
                        nacc -= drop
                        acc &= (1 << nacc) - 1
                        if limit - used >= 8:
                            m = 0x00 if data[used // 8] == 0xFF else None
                            if m is None:
                                raise ValueError("missing restart marker")
                            raise ValueError(
                                f"bad restart marker: want RST{idx & 7}, "
                                f"got 0x{m:02X}"
                            )
                        if term is None:
                            raise ValueError("missing restart marker")
                        if term != 0xD0 + (idx & 7):
                            raise ValueError(
                                f"bad restart marker: want RST{idx & 7}, "
                                f"got 0x{term:02X}"
                            )
                        seg_i += 1
                        data, term = segs[seg_i]
                        dlen = len(data)
                        limit = dlen * 8
                        bytepos = acc = nacc = used = 0
                        preds = [0] * ncomp_scan
                    for ci in range(ncomp_scan):
                        dc_lut, ac_lut = luts[ci]
                        blk = [0] * 64
                        # --- DC: one LUT symbol + category bits
                        while nacc < 16:
                            if bytepos < dlen:
                                acc = (acc << 8) | data[bytepos]
                                bytepos += 1
                            else:
                                acc <<= 8
                            nacc += 8
                        e = dc_lut[(acc >> (nacc - 16)) & 0xFFFF]
                        if e and used + (e >> 8) <= limit:
                            t = e & 0xFF
                            nacc -= e >> 8
                            used += e >> 8
                            acc &= (1 << nacc) - 1
                        else:
                            if e == 0 and limit - used >= 16:
                                raise ValueError(
                                    "invalid Huffman code in JPEG entropy data"
                                )
                            if term is not None:
                                raise _BitReader.Marker(term)
                            raise ValueError("truncated JPEG entropy data")
                        if t:
                            while nacc < t:
                                if bytepos < dlen:
                                    acc = (acc << 8) | data[bytepos]
                                    bytepos += 1
                                else:
                                    acc <<= 8
                                nacc += 8
                            if used + t > limit:
                                if term is not None:
                                    raise _BitReader.Marker(term)
                                raise ValueError("truncated JPEG entropy data")
                            v = (acc >> (nacc - t)) & ((1 << t) - 1)
                            nacc -= t
                            used += t
                            acc &= (1 << nacc) - 1
                            preds[ci] += (
                                v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                            )
                        blk[0] = preds[ci]
                        # --- AC: run-length loop, one LUT symbol each
                        k = 1
                        while k < 64:
                            while nacc < 16:
                                if bytepos < dlen:
                                    acc = (acc << 8) | data[bytepos]
                                    bytepos += 1
                                else:
                                    acc <<= 8
                                nacc += 8
                            e = ac_lut[(acc >> (nacc - 16)) & 0xFFFF]
                            if e and used + (e >> 8) <= limit:
                                rs = e & 0xFF
                                nacc -= e >> 8
                                used += e >> 8
                                acc &= (1 << nacc) - 1
                            else:
                                if e == 0 and limit - used >= 16:
                                    raise ValueError(
                                        "invalid Huffman code in JPEG entropy data"
                                    )
                                if term is not None:
                                    raise _BitReader.Marker(term)
                                raise ValueError("truncated JPEG entropy data")
                            s = rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            while nacc < s:
                                if bytepos < dlen:
                                    acc = (acc << 8) | data[bytepos]
                                    bytepos += 1
                                else:
                                    acc <<= 8
                                nacc += 8
                            if used + s > limit:
                                if term is not None:
                                    raise _BitReader.Marker(term)
                                raise ValueError("truncated JPEG entropy data")
                            v = (acc >> (nacc - s)) & ((1 << s) - 1)
                            nacc -= s
                            used += s
                            acc &= (1 << nacc) - 1
                            blk[k] = (
                                v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            )
                            k += 1
                        blocks[ci].append(blk)
                    mcu += 1
            # batch de-zigzag + dequantize: one fancy-index assignment and
            # one broadcast multiply per component
            coeffs = []
            for ci, (_, tq) in enumerate(comps):
                q = qtables[tq]
                nblk = len(blocks[ci])
                arr = (
                    np.asarray(blocks[ci], dtype=np.int32)
                    if nblk
                    else np.zeros((0, 64), dtype=np.int32)
                )
                dez = np.zeros((nblk, 64), dtype=np.int32)
                dez[:, _ZZFLAT] = arr
                coeffs.append(dez.reshape(by, bx, 8, 8) * q)
            return w, h, comps, coeffs
        pos += seglen
    raise ValueError("JPEG ended without an SOS scan")


def decode_jpeg_coeffs(content: bytes):
    """Entropy-layer decode only: returns (w, h, [coeff_blocks]) with the
    DEQUANTIZED coefficient planes — everything before the IDCT. Exact
    integers, which is what makes the coefficient path hash-checkable."""
    w, h, _comps, coeffs = _parse_jpeg(content)
    return w, h, coeffs


def decode_jpeg(content: bytes) -> np.ndarray:
    """bytes -> (h, w, 3) uint8 RGB via IDCT + level shift (+ JFIF
    YCbCr->RGB when 3 components; grayscale replicated)."""
    w, h, comps, coeffs = _parse_jpeg(content)
    T = _dct_matrix()
    planes = []
    for plane in coeffs:
        by, bx = plane.shape[:2]
        # batched IDCT: (by*bx, 8, 8) @ basis, then reassemble
        blocks = plane.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ur,nuv,vc->nrc", T, blocks, T)
        full = spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            by * 8, bx * 8
        )
        planes.append(full[:h, :w] + 128.0)
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


_DC_CODES: dict[int, tuple[int, int]] | None = None
_AC_CODES: dict[int, tuple[int, int]] | None = None


def _encode_entropy(
    planes: list[np.ndarray],
    qtables: list[np.ndarray],
    w: int,
    h: int,
    restart_interval: int = 0,
) -> bytes:
    """Shared writer: planes are per-component int32 QUANTIZED coefficient
    arrays (by, bx, 8, 8); emits a complete baseline stream."""
    import struct

    ncomp = len(planes)
    # the Annex K tables are constants — build their code maps once per
    # process (round 15), not once per image
    global _DC_CODES, _AC_CODES
    if _DC_CODES is None:
        _DC_CODES = _huff_codes(_DC_BITS, _DC_VALS)
        _AC_CODES = _huff_codes(_AC_BITS, _AC_VALS)
    dc_codes, ac_codes = _DC_CODES, _AC_CODES

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2))
        out.extend(body)

    for ti, q in enumerate(qtables):
        zz = bytes(q.reshape(64)[_ZZFLAT].astype(np.uint8).tolist())
        seg(0xDB, bytes([ti]) + zz)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, len(qtables) - 1)])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    by, bx = planes[0].shape[:2]
    # Round 15: the per-BIT _BitWriter cost length+size appends per
    # symbol, and the per-block 64-step zigzag gather cost 64 numpy
    # scalar reads. Zigzag runs as ONE fancy-index pass per component
    # (with .tolist() so the scan loop touches Python ints), last
    # nonzero index is vectorized, and bits go through an int
    # accumulator flushed a byte at a time with inline 0xFF stuffing —
    # byte-identical output to the per-bit writer by construction
    # (pinned by the roundtrip tests and the decoder's exactness).
    zzs = []
    lastnzs = []
    for ci in range(ncomp):
        flat = planes[ci].reshape(-1, 64)[:, _ZZFLAT]
        zzs.append(flat.tolist())
        nz = flat[:, 1:] != 0
        lastnzs.append(
            np.where(nz.any(axis=1), 63 - np.argmax(nz[:, ::-1], axis=1), 0)
            .tolist()
        )
    ebuf = bytearray()
    acc = 0
    nbits = 0
    preds = [0] * ncomp
    mcu = 0
    zrl_code, zrl_len = ac_codes[0xF0]
    eob_code, eob_len = ac_codes[0x00]
    for b in range(by * bx):
        if restart_interval and mcu and mcu % restart_interval == 0:
            if nbits:  # pad to byte boundary with 1-bits
                pad = 8 - nbits
                acc = (acc << pad) | ((1 << pad) - 1)
                byte = acc & 0xFF
                ebuf.append(byte)
                if byte == 0xFF:
                    ebuf.append(0)
                acc = nbits = 0
            out.extend(ebuf)
            ebuf = bytearray()
            n = mcu // restart_interval - 1
            out.extend(b"\xff" + bytes([0xD0 + (n & 7)]))
            preds = [0] * ncomp
        for ci in range(ncomp):
            zz = zzs[ci][b]
            dc = zz[0]
            diff = dc - preds[ci]
            preds[ci] = dc
            t = diff.bit_length() if diff > 0 else (-diff).bit_length()
            code, length = dc_codes[t]
            if t:
                acc = (
                    (acc << length) | code
                ) << t | (diff if diff > 0 else diff + (1 << t) - 1)
                nbits += length + t
            else:
                acc = (acc << length) | code
                nbits += length
            while nbits >= 8:
                nbits -= 8
                byte = (acc >> nbits) & 0xFF
                ebuf.append(byte)
                if byte == 0xFF:
                    ebuf.append(0)
            acc &= (1 << nbits) - 1
            run = 0
            last_nz = lastnzs[ci][b]
            for k in range(1, last_nz + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acc = (acc << zrl_len) | zrl_code
                    nbits += zrl_len
                    run -= 16
                s = v.bit_length() if v > 0 else (-v).bit_length()
                code, length = ac_codes[(run << 4) | s]
                acc = ((acc << length) | code) << s | (
                    v if v > 0 else v + (1 << s) - 1
                )
                nbits += length + s
                while nbits >= 8:
                    nbits -= 8
                    byte = (acc >> nbits) & 0xFF
                    ebuf.append(byte)
                    if byte == 0xFF:
                        ebuf.append(0)
                acc &= (1 << nbits) - 1
                run = 0
            if last_nz < 63:
                acc = (acc << eob_len) | eob_code
                nbits += eob_len
                while nbits >= 8:
                    nbits -= 8
                    byte = (acc >> nbits) & 0xFF
                    ebuf.append(byte)
                    if byte == 0xFF:
                        ebuf.append(0)
                acc &= (1 << nbits) - 1
        mcu += 1
    if nbits:
        pad = 8 - nbits
        acc = (acc << pad) | ((1 << pad) - 1)
        byte = acc & 0xFF
        ebuf.append(byte)
        if byte == 0xFF:
            ebuf.append(0)
    out.extend(ebuf)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def encode_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG bytes.

    Default quantization table is all-ones (maximum fidelity: the only
    loss is coefficient rounding). Pass a standard table for realistic
    compression. Edge-replication pads to 8x8 multiples."""
    T = _dct_matrix()
    if pixels.ndim == 2:
        comps = [pixels.astype(np.float64)]
    else:
        px = pixels.astype(np.float64)
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [y, cb, cr]
    h, w = comps[0].shape
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int32)
    by, bx = (h + 7) // 8, (w + 7) // 8
    # one padded stack + one einsum for ALL components (round 15): the
    # per-component einsum/pad overhead dominated tiny images; the
    # per-block arithmetic (and hence the emitted bytes) is unchanged
    nc = len(comps)
    stack = np.stack(comps)
    padded = np.pad(
        stack, ((0, 0), (0, by * 8 - h), (0, bx * 8 - w)), mode="edge"
    ) - 128.0
    blocks = (
        padded.reshape(nc, by, 8, bx, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(-1, 8, 8)
    )
    fdct = np.einsum("ur,nrc,vc->nuv", T, blocks, T)
    scaled = fdct / quant.astype(np.float64)
    # round half away from zero (libjpeg's convention), exactly
    qz = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    qzp = qz.astype(np.int32).reshape(nc, by, bx, 8, 8)
    planes = [qzp[ci] for ci in range(nc)]
    return _encode_entropy(planes, [quant.astype(np.int32)], w, h,
                           restart_interval)


def encode_jpeg_from_coeffs(
    planes: list[np.ndarray],
    w: int,
    h: int,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Build a baseline stream straight from integer QUANTIZED coefficient
    blocks (each (by, bx, 8, 8) int32) — the exact-entropy-layer fixture
    path: what goes in is bit-for-bit what decode_jpeg_coeffs returns
    (times the quant table)."""
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int32)
    return _encode_entropy(
        [p.astype(np.int32) for p in planes], [quant.astype(np.int32)],
        w, h, restart_interval,
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

    The stdlib codecs handle P6 PPM, non-interlaced 8-bit PNG and
    baseline 4:4:4 JPEG natively; PIL, when importable, covers everything
    else (progressive/subsampled JPEG, GIF, ...); otherwise an honest
    NotImplementedError — never a silent fake."""
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(content)
    if content[:2] == b"\xff\xd8":
        return decode_jpeg(content)
    if not _HAVE_PIL:
        raise NotImplementedError(
            "decoding non-PPM/PNG/JPEG images requires PIL; this "
            "environment decodes uncompressed P6 PPM (decode_ppm), "
            "non-interlaced 8-bit PNG (decode_png) and baseline 4:4:4 "
            "JPEG (decode_jpeg)"
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


JPEG_COEFF_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_blocks", IntegerType()),
        StructField("sum_dc", LongType()),
        StructField("sum_coeff", LongType()),
        StructField("sum_abs", LongType()),
        StructField("n_nonzero_ac", LongType()),
    ]
)


def decode_jpeg_coeff_stats(df: DataFrame) -> DataFrame:
    """Entropy-layer decode via ``decode_jpeg_coeffs``: Huffman + DPCM +
    run-length + de-zigzag + dequant, NO IDCT — the stats are exact
    integers over the coefficient planes, so the whole entropy path is
    bit-checkable (a one-bit Huffman slip corrupts every later value).

    Scale shape: identical to decode_image_stats — streaming Arrow
    batches, blob never leaves the executor."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "width", "height", "n_blocks",
                "sum_dc", "sum_coeff", "sum_abs", "n_nonzero_ac")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, coeffs = decode_jpeg_coeffs(bytes(content))
                n_blocks = sum(p.shape[0] * p.shape[1] for p in coeffs)
                sum_dc = sum(int(p[:, :, 0, 0].sum()) for p in coeffs)
                sum_coeff = sum(int(p.sum(dtype=np.int64)) for p in coeffs)
                sum_abs = sum(
                    int(np.abs(p).sum(dtype=np.int64)) for p in coeffs
                )
                nz = sum(
                    int(np.count_nonzero(p)) for p in coeffs
                ) - sum(
                    int(np.count_nonzero(p[:, :, 0, 0])) for p in coeffs
                )
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_blocks"].append(n_blocks)
                out["sum_dc"].append(sum_dc)
                out["sum_coeff"].append(sum_coeff)
                out["sum_abs"].append(sum_abs)
                out["n_nonzero_ac"].append(nz)
            yield pd.DataFrame(out)

    return df.mapInPandas(_stats, JPEG_COEFF_STATS_SCHEMA)


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


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("energy", LongType()),
        StructField("rms", DoubleType()),
    ]
)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """Signal features over REAL-decoded PCM (channel 0): zero-crossing
    count (strict sign flips, zeros break a run), total energy Σv² as an
    exact integer, and RMS = sqrt(energy / n_frames). The first two are
    integer-exact across engines; RMS is one division of exact integers
    plus one sqrt — both correctly-rounded IEEE ops, so it hashes too.
    Same Arrow mapInPandas shape as decode_audio_stats: the decode cost
    is per-batch vectorized numpy, no per-row Python in the stream."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "n_frames", "zero_crossings", "energy", "rms")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, _rate = decode_wav(bytes(content))
                ch0 = samples[:, 0].astype(np.int64)
                n = ch0.shape[0]
                zc = int(((ch0[1:] * ch0[:-1]) < 0).sum()) if n > 1 else 0
                energy = int((ch0 * ch0).sum())
                out["media_id"].append(mid)
                out["n_frames"].append(n)
                out["zero_crossings"].append(zc)
                out["energy"].append(energy)
                out["rms"].append(float(np.sqrt(energy / n)) if n else 0.0)
            yield pd.DataFrame(out)

    return df.mapInPandas(_feats, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hash (pHash, round 7): 64-bit DCT sign-structure hash for
# image NEAR-duplicate detection — the production tool for "same picture,
# different bytes" (re-encode, mild noise, slight crop) that exact
# raster-md5 dedup (decode_image_stats / mm_image_dedup) cannot catch.
# Classic recipe: gray -> 32x32 -> 2D DCT -> 8x8 low-frequency block ->
# threshold each coefficient against the median (DC excluded from the
# median so it cannot drag it) -> 64 bits.
# ---------------------------------------------------------------------------


def _dct_matrix_n(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II matrix (generalizes _dct_matrix)."""
    x = np.arange(n)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    T[0, :] = 1.0 / np.sqrt(n)
    return T


_D32 = _dct_matrix_n(32)


def phash64_pixels(pixels: np.ndarray) -> int:
    """(h, w, 3) uint8 RGB -> 64-bit perceptual hash as a Python int.

    Deterministic: nearest-index resample to 32x32 (no interpolation
    kernel choices), orthonormal DCT, median threshold over the 8x8
    low-frequency block with the DC term excluded from the median.
    """
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    g32 = g[np.ix_(ys, xs)]
    d = _D32 @ g32 @ _D32.T
    low = d[:8, :8].flatten()
    med = float(np.median(low[1:]))
    out = 0
    for i, v in enumerate(low):
        if v > med:
            out |= 1 << i
    return out


PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)


def phash_images(df: DataFrame) -> DataFrame:
    """(media_id, content) -> (media_id, phash BIGINT) via the REAL
    decode path (``decode_real``) + ``phash64_pixels``, streamed in Arrow
    batches through mapInPandas — blob never leaves the executor."""

    def _hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_real(bytes(content))
                h = phash64_pixels(px)
                # fold to signed 64-bit so the column is a plain BIGINT
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(int(mid))
                hs.append(h)
            yield pd.DataFrame({"media_id": ids, "phash": hs})

    return df.select("media_id", "content").mapInPandas(_hashes, PHASH_SCHEMA)


def phash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 6, hash_col: str = "phash"
) -> DataFrame:
    """(media_id, <hash_col>) -> candidate pairs with Hamming <= max_hamming.

    Hash-agnostic: serves the image pHash AND the audio fingerprint
    (fingerprint_audio) — any 64-bit perceptual hash pairs through the
    same guaranteed-recall banded join.

    Combinatorial 2-of-8 banding: the 64-bit hash splits into 8 bytes;
    every unordered band pair (i<j) forms one of C(8,2)=28 composite
    16-bit keys. A pair of images at Hamming <= 6 differs in at most 6
    bands, so at least TWO bands are identical on both sides and the
    pair is guaranteed to collide on that bands' composite key —
    pigeonhole recall with 16-bit bucket granularity (65536x28 buckets,
    not the 256-bucket hot spots plain 8-bit banding would make at
    corpus scale). Verification is exact bit_count(xor) on the
    candidates only. All JVM-side after the hash frame.
    """
    hcol = F.col(hash_col)
    bands = [
        F.shiftrightunsigned(hcol, 8 * i).bitwiseAND(F.lit(255)) for i in range(8)
    ]
    keys = F.array(
        *[
            F.struct(
                F.lit(i * 8 + j).alias("key_idx"),
                (bands[i] * 256 + bands[j]).cast("int").alias("key_val"),
            )
            for i in range(8)
            for j in range(i + 1, 8)
        ]
    )
    kf = hashes.select("media_id", hash_col, F.explode(keys).alias("k")).select(
        "media_id", hash_col, F.col("k.key_idx").alias("key_idx"),
        F.col("k.key_val").alias("key_val"),
    )
    a = kf.select(
        F.col("media_id").alias("id_a"), F.col(hash_col).alias("ph_a"),
        "key_idx", "key_val",
    )
    b = kf.select(
        F.col("media_id").alias("id_b"), F.col(hash_col).alias("ph_b"),
        "key_idx", "key_val",
    )
    cand = (
        a.join(b, ["key_idx", "key_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("ph_a").bitwiseXOR(F.col("ph_b"))
            ).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Audio fingerprint (round 7): Haitsma-Kalker-style 64-bit robust hash —
# the audio twin of the image pHash for "same recording, different
# bytes" near-dup detection (re-encode, gain change, light noise).
# Recipe: frame the first channel into 512-sample windows, power
# spectrum per frame (rFFT), 4 log-spaced band energies, one bit per
# (frame transition, band): is this band's energy rising? 16 transitions
# x 4 bands = 64 bits. Energy-RATIO signs are invariant to volume
# scaling and robust to additive noise — exactly what byte hashes are
# not. Shares the combinatorial banded Hamming join with the image
# pHash (phash_near_dup_pairs).
# ---------------------------------------------------------------------------

AFP_FRAME = 512
AFP_BAND_EDGES = (1, 8, 32, 96, 257)  # rFFT bin ranges: 4 log-spaced bands
AFP_TRANSITIONS = 16


def audio_fingerprint64(samples: np.ndarray) -> int:
    """(n_frames, n_channels) int16 -> 64-bit fingerprint (Python int).

    Uses channel 0; needs at least (AFP_TRANSITIONS+1)*AFP_FRAME frames —
    shorter clips hash whatever transitions exist (remaining bits 0).
    """
    s = samples[:, 0].astype(np.float64)
    nf = min(len(s) // AFP_FRAME, AFP_TRANSITIONS + 1)
    nbands = len(AFP_BAND_EDGES) - 1
    if nf < 2:
        # fewer than two frames -> no transitions: without a fallback,
        # EVERY short clip would hash to 0 and spuriously pair with
        # every other short clip at Hamming 0. Degrade to an exact
        # content hash instead (md5-derived 64 bits): short clips then
        # only match byte-identical short clips.
        import hashlib

        return int.from_bytes(
            hashlib.md5(samples[:, 0].astype("<i2").tobytes()).digest()[:8],
            "big",
        )
    # one batched rFFT over all frames (axis=1), band sums via slices —
    # the per-frame Python loop was the sf1 hot spot (34.8s -> see
    # BASELINE.md round-7 audio-fingerprint row)
    frames = s[: nf * AFP_FRAME].reshape(nf, AFP_FRAME)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    energies = np.stack(
        [
            spec[:, AFP_BAND_EDGES[b] : AFP_BAND_EDGES[b + 1]].sum(axis=1)
            for b in range(nbands)
        ],
        axis=1,
    )
    rising = (energies[1:] > energies[:-1]).astype(np.uint64).ravel()
    out = 0
    for i, bit in enumerate(rising):
        if bit:
            out |= 1 << i
    return out


def fingerprint_audio(df: DataFrame) -> DataFrame:
    """(media_id, content WAV bytes) -> (media_id, fp BIGINT) via the real
    RIFF decode path, Arrow-batched through mapInPandas."""
    schema = StructType(
        [StructField("media_id", LongType()), StructField("fp", LongType())]
    )

    def _fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, _rate = decode_wav(bytes(content))
                h = audio_fingerprint64(samples)
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(int(mid))
                fps.append(h)
            yield pd.DataFrame({"media_id": ids, "fp": fps})

    return df.select("media_id", "content").mapInPandas(_fps, schema)
