"""Row-splitting transforms (SURVEY §7 Phase 3 'explode').

Reference: /root/reference/national/_1034/transform.py:55-92
(``transform_split``) — a scraped row holding a dual candidacy
("A / B" in the name column, "R / D" in the party column) becomes one row
per candidate, with the i-th parts of every split column aligned and
non-split columns replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_multi_candidate(
    df: DataFrame, split_cols: list[str], sep: str = " / "
) -> DataFrame:
    """Explode rows whose ``split_cols`` contain ``sep``-joined variants.

    - the row fans out to max(len(parts)) rows (``candidacy`` = 1-based);
    - a split column with fewer parts than the fan-out repeats its first
      part (single values apply to every candidacy);
    - all other columns replicate unchanged.
    """
    arrays = {c: F.split(F.col(c), F.lit(sep)) for c in split_cols}
    n = F.greatest(*[F.size(a) for a in arrays.values()]) if len(arrays) > 1 else F.size(
        next(iter(arrays.values()))
    )
    out = df.select(
        *[F.col(c) for c in df.columns],
        F.posexplode(F.sequence(F.lit(1), n)).alias("_pos", "candidacy"),
    ).drop("_pos")
    for c, arr in arrays.items():
        part = F.element_at(arr, F.col("candidacy"))
        out = out.withColumn(c, F.coalesce(part, F.element_at(arr, 1)))
    return out
