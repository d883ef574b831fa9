"""J2 + A7 coverage queries: composite-key keep-first merge with card
enrichment, and consume-once dispatch via anti-join.

References:
- J2: /root/reference/national/_3308/extract.py:68-104 — rows accumulate
  keyed by (state, row_index); already-seen keys are skipped (dedupe at
  86-89) and the surviving row is enriched from a card frame (93).
- A7: /root/reference/votervoice/__main__.py:99-102 — processed sessions
  are popped so they never re-dispatch; the engine-side equivalent is an
  anti-join against a processed log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

_J2_ORACLE = """
WITH keyed AS (
  SELECT l_suppkey AS state_key, l_partkey AS row_index,
         l_orderkey, l_quantity, l_extendedprice,
         row_number() OVER (PARTITION BY l_suppkey, l_partkey
                            ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
),
survivors AS (
  SELECT state_key, row_index, l_orderkey, l_quantity FROM keyed WHERE rn = 1
)
SELECT s.state_key, s.row_index, s.l_orderkey, s.l_quantity,
       p.p_name AS card_name, p.p_brand AS card_brand
FROM survivors s
LEFT JOIN part p ON p.p_partkey = s.row_index
"""


@register(
    "j2_composite_key_merge",
    oracle=_J2_ORACLE,
    doc="J2: keep-first on composite key (deterministic order), card enrich"
        " via left join",
)
def j2_composite_key_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Keep-first as min(struct(order-cols…, payload…)) rather than a
    # row_number window: lexicographic struct-min is the same "first row
    # by (l_orderkey, l_linenumber)" semantics, but aggregates get a
    # map-side partial combine — the shuffle carries at most one
    # candidate per (suppkey, partkey) per input partition instead of
    # every lineitem row + a per-partition sort. At 100 TB that is the
    # difference between shuffling the fact table and shuffling its keys.
    first = F.min(
        F.struct("l_orderkey", "l_linenumber", "l_quantity")
    ).alias("s")
    survivors = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(first)
        .select(
            F.col("l_suppkey").alias("state_key"),
            F.col("l_partkey").alias("row_index"),
            F.col("s.l_orderkey").alias("l_orderkey"),
            F.col("s.l_quantity").alias("l_quantity"),
        )
    )
    cards = part.select(
        "p_partkey", F.col("p_name").alias("card_name"), F.col("p_brand").alias("card_brand")
    )
    return survivors.join(
        cards, F.col("row_index") == F.col("p_partkey"), "left"
    ).select("state_key", "row_index", "l_orderkey", "l_quantity", "card_name", "card_brand")


_A7_ORACLE = """
WITH processed AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS session
  FROM orders WHERE o_orderstatus = 'P' AND o_custkey % 50 = 0
),
sessions AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS session, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT s.session, s.n_orders
FROM sessions s
WHERE NOT EXISTS (SELECT 1 FROM processed p WHERE p.session = s.session)
"""


@register(
    "a7_consume_once_dispatch",
    oracle=_A7_ORACLE,
    doc="A7: consume-once session dispatch — anti-join vs processed log",
)
def a7_consume_once_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    session = F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("session")
    processed = (
        orders.filter(
            (F.col("o_orderstatus") == "P") & (F.col("o_custkey") % 50 == 0)
        )
        .select(session)
        .distinct()
    )
    sessions = orders.groupBy(session).agg(F.count(F.lit(1)).alias("n_orders"))
    return sessions.join(processed, "session", "left_anti")
