"""Temporal joins Spark lacks as builtins, expressed scale-first.

``asof_join`` — for each left row, the nearest right row of the same key
at-or-before (backward) / at-or-after (forward) its timestamp, optionally
within a tolerance. The reference joins scraped snapshots to the vote/
rating effective at scrape time by sorting per entity and scanning
(pandas ``merge_asof`` shape); a naive Spark translation is a range join
(|left| x |right| per key worst case).

Scale design: union-tag both sides, ONE shuffle on the ``by`` key, sort
by (ts, side), and fill the right payload forward with
``last(ignorenulls)``. Cost is a single hash shuffle + per-partition sort
of |left|+|right| rows — the same plan whether the inputs are 60k rows or
100 TB, with no pair explosion and AQE-handled skew. Tolerance is a
post-filter that nulls the match (left semantics keep the row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort values of this type (maps cannot be sort
    keys; structs/arrays are orderable iff their element types are)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    tolerance_s: float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the temporally nearest right
    row per ``by`` key (``right.on <= left.on`` for backward, ``>=`` for
    forward); unmatched left rows keep nulls.

    Right columns (except ``by``) come back suffixed. Ties on ``on``
    between the two sides resolve to the right row being visible
    (DuckDB/pandas ``allow_exact_matches=True`` semantics). Right rows
    with duplicate (by, on) reduce deterministically to the greatest
    payload struct (field-lexicographic max — equivalent to a
    ``max(struct(*rcols))`` pre-aggregation but without its extra
    shuffle: the payload is simply the final window sort key). When the
    payload contains an unorderable type (map), the tiebreak is skipped
    and duplicate (by, on) right rows fall back to sort-arbitrary
    resolution — pre-deduplicate in that case.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = [c for c in left.columns if c not in by]
    rcols = [c for c in right.columns if c not in by]
    rpay = F.struct(*[F.col(c) for c in rcols]).alias("__rpay")
    rpay_type = right.select(rpay).schema["__rpay"].dataType

    l_tagged = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        *lcols,
        F.lit(None).cast(rpay_type).alias("__rpay"),
    )
    # Null-ts right rows would sort before every real row (asc, nulls
    # first) and fabricate matches for otherwise-unmatched left rows;
    # pandas merge_asof rejects null keys, DuckDB ASOF returns no match.
    right = right.filter(F.col(on).isNotNull())
    r_tagged = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        rpay,
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Backward: ascending ts, right rows (side 0) sort before left rows at
    # equal ts, so an exact-ts right row is already visible. Forward is
    # the mirror image on descending ts. The payload struct is the last
    # sort key so duplicate right (by, ts) rows resolve deterministically
    # (fill-forward then sees the max payload); left rows carry a null
    # payload, which asc_nulls_first keeps inert w.r.t. the side ordering.
    order = [
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc(),
        F.col("__side").asc(),
    ]
    if _orderable(rpay_type):
        order.append(F.col("__rpay").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # A null left timestamp matches nothing (it has no place on the time
    # axis; under forward/desc ordering it would otherwise trail the
    # whole partition and see every right row).
    matched = F.when(
        F.col("__ts").isNotNull(), F.last("__rpay", ignorenulls=True).over(w)
    )

    if tolerance_s is not None:
        gap = F.col("__ts").cast("double") - matched[on].cast("double")
        if direction == "forward":
            gap = -gap
        matched = F.when(gap <= F.lit(float(tolerance_s)), matched)

    return (
        unioned.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(
            *by,
            *[F.col(c) for c in lcols],
            *[F.col("__m")[c].alias(f"{c}{suffix}") for c in rcols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    bucket_s: int = 300,
    suffix: str = "_r",
) -> DataFrame:
    """Interval-containment join: left rows paired with every right
    interval where ``right_start <= left_ts <= right_end`` (and ``by``
    keys match). One output row per (left row, containing interval).

    A naive theta-join is |left| x |right| per key. Here both sides map
    onto coarse time buckets — the interval explodes to the buckets it
    spans (``bucket_s`` wide), the point to exactly one — so the pairing
    is an equi-join on (by…, bucket) plus a residual filter, and each
    (row, interval) candidate pair arises exactly once (the point's
    single bucket). Shuffle cost is |left| + |intervals| x spanned
    buckets; pick ``bucket_s`` near the typical interval length so the
    span factor stays small. Degenerate (end < start) intervals drop out.
    """
    by = by or []
    b = float(bucket_s)
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c not in by]

    l_b = left.withColumn(
        "__bucket", F.floor(F.col(left_ts).cast("double") / b).cast("long")
    )
    r_b = (
        right.filter(F.col(right_start) <= F.col(right_end))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(right_start).cast("double") / b).cast("long"),
                    F.floor(F.col(right_end).cast("double") / b).cast("long"),
                )
            ),
        )
        .select(*by, "__bucket", *[F.col(c).alias(f"{c}{suffix}") for c in rcols])
    )
    joined = l_b.join(r_b, [*by, "__bucket"]).filter(
        (F.col(f"{right_start}{suffix}") <= F.col(left_ts))
        & (F.col(left_ts) <= F.col(f"{right_end}{suffix}"))
    )
    return joined.select(*by, *[c for c in lcols if c not in by],
                         *[f"{c}{suffix}" for c in rcols])
