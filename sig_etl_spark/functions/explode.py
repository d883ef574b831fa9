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
    sizes = [F.size(a) for a in arrays.values()]
    raw_n = F.greatest(*sizes) if len(sizes) > 1 else sizes[0]
    # All-null split columns give size(null)=null -> sequence(1, null)=null
    # -> posexplode would emit ZERO rows and silently drop the input row;
    # the reference keeps it (transform.py:55-92). Default the fan-out to 1.
    n = F.coalesce(raw_n, F.lit(1))
    out = df.select(
        *[F.col(c) for c in df.columns],
        F.posexplode(F.sequence(F.lit(1), n)).alias("_pos", "candidacy"),
    ).drop("_pos")
    for c, arr in arrays.items():
        # try_element_at: a column with fewer parts than the fan-out yields
        # null (not INVALID_ARRAY_INDEX under ANSI); coalesce then repeats
        # its first part — single values apply to every candidacy.
        part = F.try_element_at(arr, F.col("candidacy"))
        out = out.withColumn(c, F.coalesce(part, F.try_element_at(arr, F.lit(1))))
    return out
