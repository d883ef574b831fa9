"""Cross-engine-portable 64-bit hashing.

MinHash and SimHash need a fast per-token integer hash. Spark's native
``xxhash64`` is ideal JVM-side but has no DuckDB equivalent, which left
those operators rows-only in the correctness gate (VERDICT r1 item 3).
Deriving the integer from ``md5`` — which both engines implement
identically — makes the whole pipeline oracle-checkable with zero plan
change: still pure codegen expressions, one hash per distinct token.

Two variants:

- ``portable_hash60``: first 15 hex chars -> non-negative BIGINT in
  [0, 2^60). Fits a signed 64-bit without overflow, so the ANSI cast is
  safe and modular arithmetic needs no sign handling. Used by MinHash
  (values are immediately folded mod 2^31-1 anyway).
- ``portable_hash64``: full 64 bits, assembled from two 32-bit halves
  with a wrapping shift (bitwise ops don't overflow-check under ANSI).
  Used by SimHash, which wants all 64 bit positions.

DuckDB equivalents (used verbatim in the oracle SQL):

    CAST(('0x' || substr(md5(x), 1, 15)) AS UBIGINT)            -- 60-bit
    hi*2^32+lo as HUGEINT, folded to signed BIGINT two's-complement
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(c: Column) -> Column:
    """md5-derived hash in [0, 2^60) as BIGINT — identical in DuckDB via
    ``CAST(('0x' || substr(md5(x),1,15)) AS UBIGINT)``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash64(c: Column) -> Column:
    """md5-derived full 64-bit hash as signed BIGINT (two's complement) —
    identical in DuckDB via HUGEINT assembly of the two 32-bit halves."""
    hi = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32).bitwiseOR(lo)
