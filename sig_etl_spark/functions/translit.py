"""F13 full-transliteration tier (VERDICT r7 task 7).

The reference folds names with unidecode()
(/root/reference/national/_1034/transform.py:110,
/root/reference/national/_125/extract.py:50). The engine's default is
functions/text.py:fold_ascii — a JVM-side translate() over the common
Latin accent table (whole-stage codegen, no Python, oracle-checkable
because DuckDB's strip_accents agrees on that range). That covers the
reference's actual data (US political names); this module closes the
remaining semantic gap for arbitrary input with a GATED Arrow tier,
mirroring the rapidfuzz pattern in linkage/scorers.py:

- if ``unidecode`` is importable, delegate to it — exact parity with the
  reference's library;
- otherwise a stdlib approximation: NFKD decomposition + combining-mark
  strip (handles every precomposed Latin letter, far beyond the fixed
  64-char table) + a supplemental map for letters NFKD cannot decompose
  (ss/ae/oe/o/d/l/th...). Non-Latin scripts (Cyrillic, Greek, CJK) pass
  through unchanged in the fallback — only the real unidecode
  transliterates those, and the docstring says so rather than pretending.

This is deliberately a Pandas UDF (Arrow-batched, not row-at-a-time):
transliteration is genuinely inexpressible as a Spark column expression
beyond the fixed translate() table. Default stays fold_ascii — use this
tier only where full folding is required (linkage keys over
international rosters).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

try:  # optional: exact unidecode parity when the library exists
    from unidecode import unidecode as _unidecode  # type: ignore
except Exception:  # pragma: no cover - not installed in this environment
    _unidecode = None

# Letters NFKD leaves intact (no canonical decomposition) but unidecode
# folds; the classic Latin-script set. Case pairs listed explicitly so
# the fold preserves capitalization shape like unidecode does.
_SUPPLEMENT = {
    "ß": "ss", "ẞ": "SS",
    "æ": "ae", "Æ": "AE",
    "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O",
    "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "Th",
    "ł": "l", "Ł": "L",
    "ħ": "h", "Ħ": "H",
    "ŋ": "ng", "Ŋ": "NG",
    "ı": "i", "İ": "I",
    "ĸ": "k",
    "ſ": "s",
    "«": '"', "»": '"',
    "‘": "'", "’": "'",
    "“": '"', "”": '"',
    "–": "-", "—": "-",
    " ": " ",
}


def fold_ascii_py(s: str | None) -> str | None:
    """Pure-Python fold used by the Arrow tier (and directly testable).

    With unidecode installed: unidecode(s) verbatim. Without: NFKD +
    strip combining marks + _SUPPLEMENT; codepoints still outside ASCII
    after that (non-Latin scripts) are kept as-is.
    """
    if s is None:
        return None
    if _unidecode is not None:
        return _unidecode(s)
    out: list[str] = []
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue
        out.append(_SUPPLEMENT.get(ch, ch))
    return "".join(out)


@F.pandas_udf(StringType())
def _fold_full_udf(s: pd.Series) -> pd.Series:
    return s.map(fold_ascii_py)


def fold_ascii_full(c: Column) -> Column:
    """Full F13 fold as a column op (Arrow-batched Pandas UDF tier).

    Scale note: this is the SLOW PATH relative to fold_ascii's JVM
    translate() — reserve it for columns that actually contain characters
    beyond the accent table (e.g. gate with a rlike pre-filter and
    coalesce the two tiers)."""
    return _fold_full_udf(c)
