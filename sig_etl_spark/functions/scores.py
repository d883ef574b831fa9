"""Score derivations (SURVEY.md F9, A1-A3).

References:
- F9 vote-glyph translation: /root/reference/votervoice/extract.py:21-28,
  37-50 and /root/reference/states/_3166/extract.py:50-66 — raw vote
  markers become the '+'/'-'/'*' methodology alphabet, concatenated into a
  per-candidate vote string.
- A1/A2 conditional counts + percentage: /root/reference/national/_125/
  extract.py:41-68 (neutral counts 0.5), /root/reference/national/_2658/
  extract.py:36-43 (div-0 guard).
- A3 vote index: /root/reference/billtrack50_app/extract.py:59-79 —
  possible = Σ|score|, index = (total+possible)/(2·possible)·100.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def glyph_translate(arr: Column, methodology: Mapping[str, str]) -> Column:
    """F9: ARRAY<STRING> of raw vote markers -> '+-*' vote string.

    Unknown markers map to '*' (the reference's 'other' bucket).
    """
    pairs: list[Column] = []
    for k, v in methodology.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    m = F.create_map(*pairs)
    # try_element_at: unknown glyph -> null -> '*' (plain element_at throws
    # MAP_KEY_DOES_NOT_EXIST under ANSI mode, defeating the 'other' bucket).
    return F.array_join(
        F.transform(arr, lambda x: F.coalesce(F.try_element_at(m, x), F.lit("*"))), ""
    )


def good_bad_pct(good: Column, bad: Column, scale: int = 2) -> Column:
    """A2: good/(good+bad)*100, 0.0 when the denominator is 0."""
    denom = good + bad
    return F.when(denom == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(100.0) * good / denom, scale)
    )


def vote_index(total: Column, possible: Column, scale: int = 2) -> Column:
    """A3: (total+possible)/(2*possible)*100 — the billtrack50 vote index."""
    return F.when(possible == 0, F.lit(None).cast("double")).otherwise(
        F.round((total + possible) / (F.lit(2.0) * possible) * 100.0, scale)
    )
