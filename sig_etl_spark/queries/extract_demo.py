"""Oracle-checked extraction query: parse(render(x)) == x.

The driver's tables contain no HTML, so this query *renders* orders rows
into HTML table pages inside Spark (deterministically), runs the real S3
parse UDF over them, and emits the recovered records. The DuckDB oracle
selects the same rows directly — any parser defect (header zip, row
order, whitespace, explode) breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sig_etl_spark.extract import extract_records, stabilize_columns
from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

_ORACLE = """
SELECT o_custkey % 20 AS page,
       CAST(o_orderkey AS VARCHAR) AS orderkey,
       o_orderstatus AS status,
       o_orderpriority AS priority
FROM orders
"""


@register(
    "extract_s3_roundtrip",
    oracle=_ORACLE,
    doc="S3 table scan: render orders to HTML pages, parse back via the"
        " pandas UDF, recover every row",
)
def extract_s3_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    row_html = F.concat(
        F.lit("<tr><td>"), F.col("o_orderkey").cast("string"),
        F.lit("</td><td>"), F.col("o_orderstatus"),
        F.lit("</td><td>"), F.col("o_orderpriority"),
        F.lit("</td></tr>"),
    )
    pages = (
        orders.withColumn("page", F.col("o_custkey") % 20)
        .groupBy("page")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("o_orderkey"), row_html.alias("tr")))
            ).alias("rows")
        )
        .select(
            "page",
            F.concat(
                F.lit(
                    "<html><body><table><thead><tr><th>orderkey</th>"
                    "<th>status</th><th>priority</th></tr></thead><tbody>"
                ),
                F.array_join(F.transform(F.col("rows"), lambda r: r["tr"]), ""),
                F.lit("</tbody></table></body></html>"),
            ).alias("html"),
        )
    )
    # Explicit-count repartition: AQE would coalesce the tiny rendered-page
    # shuffle to 1-2 partitions, serializing the Python parse; a numbered
    # repartition is exempt from coalescing, so each page parses in its own
    # task. (Real landing zones get this for free: one file = one split.)
    records = extract_records(pages.repartition(20, "page"), parser="table")
    flat = stabilize_columns(records, keys=["orderkey", "status", "priority"])
    return flat.select("page", "orderkey", "status", "priority")
