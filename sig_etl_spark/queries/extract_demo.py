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


# ---------------------------------------------------------------------------
# S4: card scan — render customers as card markup, parse back with the
# real card extractor (data-field spans + link target -> candidate_url,
# the P5-style header augmentation).
# Reference shape: national/_2994/endorse/extract.py:19-37.
# ---------------------------------------------------------------------------

_CARDS_ORACLE = """
SELECT c_custkey % 10 AS page,
       c_name AS name,
       c_mktsegment AS segment,
       'https://cards.example/c/' || CAST(c_custkey AS VARCHAR) AS candidate_url
FROM customer
"""


@register(
    "extract_s4_cards",
    oracle=_CARDS_ORACLE,
    doc="S4 card scan: render customers to card markup, parse back via the"
        " pandas UDF, recover every record",
)
def extract_s4_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    card_html = F.concat(
        F.lit('<div class="card"><span data-field="name">'), F.col("c_name"),
        F.lit('</span><span data-field="segment">'), F.col("c_mktsegment"),
        F.lit('</span><a href="https://cards.example/c/'),
        F.col("c_custkey").cast("string"),
        F.lit('">profile</a></div>'),
    )
    pages = (
        cust.withColumn("page", F.col("c_custkey") % 10)
        .groupBy("page")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("c_custkey"), card_html.alias("card")))
            ).alias("cards")
        )
        .select(
            "page",
            F.concat(
                F.lit("<html><body>"),
                F.array_join(F.transform(F.col("cards"), lambda c: c["card"]), ""),
                F.lit("</body></html>"),
            ).alias("html"),
        )
    )
    records = extract_records(pages.repartition(10, "page"), parser="cards")
    flat = stabilize_columns(records, keys=["name", "segment", "candidate_url"])
    return flat.select("page", "name", "segment", "candidate_url")


# ---------------------------------------------------------------------------
# S5: nested scan + flatten — region > nation > supplier rendered as the
# group/position/candidate hierarchy; inner records inherit the outer
# data-* attributes exactly like the reference's election-group walk.
# Reference shape: national/_1034/extract.py:26-74.
# ---------------------------------------------------------------------------

_NESTED_ORACLE = """
SELECT r_name AS region, n_name AS nation, s_name AS name,
       CAST(s_acctbal AS VARCHAR) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


@register(
    "extract_s5_nested",
    oracle=_NESTED_ORACLE,
    doc="S5 nested scan: render region>nation>supplier hierarchy, parse"
        " back with attribute inheritance, recover every leaf",
)
def extract_s5_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cand_html = F.concat(
        F.lit('<div class="candidate"><span data-field="name">'), F.col("s_name"),
        F.lit('</span><span data-field="acctbal">'), F.col("s_acctbal").cast("string"),
        F.lit("</span></div>"),
    )
    nations = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_nationkey", "n_name", "n_regionkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("s_suppkey"), cand_html.alias("c")))
            ).alias("cands")
        )
        .select(
            "n_nationkey",
            "n_regionkey",
            F.concat(
                F.lit('<div class="position" data-nation="'), F.col("n_name"),
                F.lit('">'),
                F.array_join(F.transform(F.col("cands"), lambda c: c["c"]), ""),
                F.lit("</div>"),
            ).alias("pos"),
        )
    )
    pages = (
        nations.join(F.broadcast(reg), nations["n_regionkey"] == reg["r_regionkey"])
        .groupBy("r_regionkey", "r_name")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("n_nationkey"), F.col("pos")))
            ).alias("positions")
        )
        .select(
            F.col("r_regionkey").alias("page"),
            F.concat(
                F.lit('<html><body><div class="group" data-region="'),
                F.col("r_name"),
                F.lit('">'),
                F.array_join(F.transform(F.col("positions"), lambda p: p["pos"]), ""),
                F.lit("</div></body></html>"),
            ).alias("html"),
        )
    )
    records = extract_records(pages.repartition(5, "page"), parser="nested")
    flat = stabilize_columns(records, keys=["region", "nation", "name", "acctbal"])
    return flat.select("region", "nation", "name", "acctbal")
