"""Extraction layer: landing-zone scans + schema-on-read HTML parsing.

Spark pipeline (SURVEY §7 Phase 2):

    binaryFile landing scan (S2) -> parse UDF -> ARRAY<MAP<STRING,STRING>>
    -> posexplode (row order preserved) -> schema stabilization
    -> dense re-index (A9)

The parse runs as an Arrow-batched UDF on the executors — at 100 TB the
landing zone is millions of files; parsing parallelizes per file with no
driver involvement. Partition values ride on the file path (S10).
"""

from sig_etl_spark.extract.parse import (  # noqa: F401
    PARSERS,
    extract_card_records,
    extract_nested_records,
    extract_sectioned_records,
    extract_table_records,
)
from sig_etl_spark.extract.spark_io import (  # noqa: F401
    extract_records,
    latest_files,
    read_landing,
    reindex,
    slice_records,
    stabilize_columns,
)
