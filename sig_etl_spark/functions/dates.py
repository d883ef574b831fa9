"""Date parsing (SURVEY.md F8).

Reference: /root/reference/national/_1034/transform.py:186-209 — parse
``"November 5,2024"`` to ISO ``2024-11-05``; anything unparseable becomes
null (the reference catches ValueError and blanks the cell).

`try_to_date` gives null-on-failure under BOTH ANSI modes (plain `to_date`
throws CANNOT_PARSE_TIMESTAMP when `spark.sql.ansi.enabled=true`, which is
the Spark 4 default), so the whole routine is one expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LONG_DATE_FMT = "MMMM d,yyyy"


def parse_long_date(c: Column, fmt: str = LONG_DATE_FMT) -> Column:
    """'November 5,2024' -> DATE 2024-11-05; invalid -> null."""
    return F.try_to_date(F.trim(c), fmt)
