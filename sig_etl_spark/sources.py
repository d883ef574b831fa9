"""Sources and sinks (SURVEY §2.1 S12-S15, K1).

The engine's canonical stage format is parquet (pipeline.py); these
wrappers cover the reference's interop surface:

- CSV stage re-entry with the reference's NaN policy (S15/K1): the
  reference round-trips records through CSV between stages with
  ``na_values='nan', keep_default_na=False`` — i.e. only the literal
  string 'nan' is null; empty string is a *value*
  (/root/reference/templates/template_script.py:161-183, SURVEY §1.1).
- JDBC candidate-dimension source (S12/S13): the VSDB Postgres becomes
  ``spark.read.jdbc`` with predicate-pushdown-friendly query strings
  (/root/reference/votervoice/match.py:22-35). No database exists in the
  test environment, so this path is exercised only through its query
  construction, which is pure.
- Excel driver-table source (S14): pandas round-trip, import-gated
  (/root/reference/national/_2155/__main__.py:119-120).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_stage_csv(df: DataFrame, path: str) -> None:
    """K1: header CSV sink with the reference's missing-value encoding
    (nulls written as the literal 'nan' so a CSV round-trip is lossless
    under read_stage_csv)."""
    df.write.mode("overwrite").option("header", True).option(
        "nullValue", "nan"
    ).csv(path)


def read_stage_csv(spark: SparkSession, path: str) -> DataFrame:
    """S15: stage re-entry from CSV. Only the literal 'nan' is null;
    empty strings survive as empty strings (keep_default_na=False
    semantics). All columns arrive as strings — the record-batch IR."""
    return (
        spark.read.option("header", True)
        .option("nullValue", "nan")
        .option("emptyValue", "")
        .option("inferSchema", False)
        .csv(path)
    )


def jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S12: run a dimension query against an external DB.

    The WHERE clauses the reference interpolates as ``= ANY(%(list)s)``
    params should be baked into ``query`` (see vsdb.render_any_list) so
    the database — not Spark — does the filtering, exactly like the
    reference's pushdown. For big dimensions pass partition_column +
    bounds to parallelize the read.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def render_any_list(column: str, values: list) -> str:
    """Render the reference's ``col = ANY(%(list)s)`` as portable SQL IN.

    Strings are quoted with doubled single quotes; the empty list renders
    FALSE (ANY over empty set).
    """
    if not values:
        return "FALSE"
    rendered = ", ".join(
        "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else str(v)
        for v in values
    )
    return f"{column} IN ({rendered})"


def read_excel(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """S14: Excel driver table via pandas (dtype=str, like the
    reference's zip-code table read). Import-gated: raises a clear error
    when openpyxl/xlrd are absent."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, dtype=str, **kwargs)
    except ImportError as e:  # pragma: no cover - engine not installed here
        raise NotImplementedError(
            "read_excel needs an excel engine (openpyxl); install it or "
            "convert the driver table to CSV and use read_stage_csv"
        ) from e
    return spark.createDataFrame(pdf)
