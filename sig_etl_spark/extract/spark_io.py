"""Spark wiring for the extraction layer."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from sig_etl_spark.extract.parse import PARSERS

RECORDS_TYPE = ArrayType(MapType(StringType(), StringType()))


def read_landing(
    spark: SparkSession, landing_dir: str, glob: str = "*.html"
) -> DataFrame:
    """S2: scan a landing zone of raw pages.

    binaryFile carries (path, modificationTime, content); ordering by
    modificationTime reproduces the reference's ctime-sorted re-extraction
    (/root/reference/templates/template_extract.py:76-84). P9's filename
    predicate is the pathGlobFilter pushdown — pruned at file listing,
    before any bytes are read.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(landing_dir)
        .select(
            F.col("path"),
            F.col("modificationTime"),
            F.decode(F.col("content"), "UTF-8").alias("html"),
        )
    )


def extract_records(
    df: DataFrame,
    parser: str = "table",
    html_col: str = "html",
    partition_pattern: str | None = None,
) -> DataFrame:
    """Parse each page into records (S3-S6 via ``parser``), one output row
    per record with in-page order in ``row_idx``.

    Parsing and flattening happen in a single ``mapInPandas`` pass that
    emits flat (passthrough…, row_idx, record MAP) rows. Returning
    ``ARRAY<MAP>`` from a pandas UDF and posexploding JVM-side costs ~3x
    more at sf0.1: the giant per-page array must round-trip through one
    Arrow value before the generate re-rows it, while the iterator shape
    streams record-sized Arrow batches straight into the plan.

    ``partition_pattern``: optional regex over the file path whose group 1
    becomes the ``partition`` column (S10 — the reference tags rows with
    the state/office/session the page was scraped for).
    """
    fn = PARSERS[parser]
    passthrough = [c for c in df.columns if c != html_col]
    schema = StructType(
        [df.schema[c] for c in passthrough]
        + [
            StructField("row_idx", IntegerType()),
            StructField("record", MapType(StringType(), StringType())),
        ]
    )

    def _parse_pages(batches):
        for pdf in batches:
            rep: list[int] = []
            row_idx: list[int] = []
            records: list[dict[str, str]] = []
            for i, html in enumerate(pdf[html_col]):
                recs = fn(html or "")
                rep.extend([i] * len(recs))
                row_idx.extend(range(len(recs)))
                records.extend(recs)
            out = pdf.iloc[rep][passthrough].reset_index(drop=True)
            out["row_idx"] = pd.Series(row_idx, dtype="int32")
            out["record"] = records
            yield out

    out = df.mapInPandas(_parse_pages, schema)
    if partition_pattern is not None:
        out = out.withColumn(
            "partition", F.regexp_extract(F.col("path"), partition_pattern, 1)
        )
    return out


def stabilize_columns(
    df: DataFrame,
    keys: list[str] | None = None,
    record_col: str = "record",
    max_keys: int = 4096,
) -> DataFrame:
    """§1.2 schema stabilization: MAP payload -> one column per key.

    When ``keys`` is None they are discovered with a key-frequency scan,
    capped at the ``max_keys`` most frequent (bounded by construction:
    the collect is a LIMIT over an aggregate, never row cardinality — a
    pathological corpus minting a fresh key per row cannot unboundedly
    grow the driver heap, mirroring collect_boilerplate_segments's
    max_segments cap), and sorted so the output schema is deterministic
    across runs/partitionings. For the HTML use case the key universe is
    header-name-sized, so the cap never binds there; ties at the cap
    boundary break by key name so the kept set is deterministic.
    """
    if keys is None:
        # Fetch one row past the cap: if it exists the cap BINDS, and a
        # silent schema truncation would violate the repo's "caps are
        # recorded, never silent" convention — warn with the bound.
        ranked = (
            df.select(F.explode(F.map_keys(F.col(record_col))).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("k"))
            .limit(max_keys + 1)
            .collect()
        )
        if len(ranked) > max_keys:
            import warnings

            warnings.warn(
                f"stabilize_columns: >{max_keys} distinct map keys; "
                f"keeping the {max_keys} most frequent (pass keys=[...] "
                "or raise max_keys to keep more)",
                stacklevel=2,
            )
        keys = sorted(r.k for r in ranked[:max_keys])
    cols = [c for c in df.columns if c != record_col]
    # try_element_at: a record missing a key yields null, not
    # MAP_KEY_DOES_NOT_EXIST under ANSI mode (ragged pages are normal).
    return df.select(
        *cols,
        *[F.try_element_at(F.col(record_col), F.lit(k)).alias(k) for k in keys],
    )


def latest_files(
    df: DataFrame, n: int, ts_col: str = "modificationTime"
) -> DataFrame:
    """O1: keep the ``n`` most recently modified files of a landing scan.

    The reference sorts the landing dir by ctime and re-extracts the
    newest batch (templates/template_extract.py:76-84). A global
    row_number over the *file listing* is a single-partition sort, but it
    ranks one row per file — bounded by directory size, never by record
    count — so it is safe at any data scale. Ties break on path for
    determinism.
    """
    w = Window.orderBy(F.col(ts_col).desc(), F.col("path").desc())
    return (
        df.withColumn("_file_rank", F.row_number().over(w))
        .filter(F.col("_file_rank") <= n)
        .drop("_file_rank")
    )


def slice_records(
    df: DataFrame, start: int = 0, stop: int | None = None
) -> DataFrame:
    """P4: positional slice of in-page records, ``records[start:stop]``.

    The reference drops header/footer rows positionally after parsing
    (e.g. ``rows[1:]``); here position is the ``row_idx`` that
    ``extract_records`` stamps per page, so the slice is a plain filter —
    fully distributed, no sort.
    """
    out = df.filter(F.col("row_idx") >= start)
    if stop is not None:
        out = out.filter(F.col("row_idx") < stop)
    return out


def reindex(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """A9: dense 0-based row ids in deterministic order.

    A global row_number is a single-partition sort at the extreme; for the
    reference's semantics (stable ids per extract batch) this is the
    faithful rewrite, and extract batches are per-group page sets, not the
    100 TB fact table.
    """
    w = Window.orderBy(*order_cols)
    return df.withColumn("row_id", F.row_number().over(w) - 1)
