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


# ---------------------------------------------------------------------------
# J6 scalar-CTE cross join, driver-visible (round 8). The reference's
# queries/office-candidates_by_congstatus.sql declares its term window
# as a 1-row scalar CTE (`CROSS JOIN (SELECT ... AS local_var)`) and
# filters statusdate BETWEEN those scalars; the engine's vsdb twin
# (vsdb.office_candidates_by_congstatus) runs against JDBC inputs the
# parquet-only driver harness cannot exercise. This query replays the
# EXACT shape on the parquet fixture so J6 finally has a driver
# CORRECTNESS row: orders stand in for congstatus (status events by
# date), customer for candidate, nation for office. The 1-row params
# frame is DERIVED FROM DATA (not literals — the point of J6), cross
# joined (broadcast: Spark's physical form of a scalar CTE), the window
# predicate compared in epoch days (floor(epoch/86400) — the identical-
# IEEE convention driver-proven in the RFM family), and the keep-first
# window matches the reference's DISTINCT ON. Scale shape: the scalar
# CTE is a 1-row aggregate broadcast everywhere; the only data-sized
# shuffle is the per-customer keep-first window.
# ---------------------------------------------------------------------------

_J6_WINDOW_DAYS = 90

_J6_ORACLE = f"""
WITH params AS (
  SELECT CAST(floor(epoch(MAX(o_orderdate)) / 86400.0) AS BIGINT) AS term_end_day
  FROM orders
),
st AS (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) AS status_day
  FROM orders
),
windowed AS (
  SELECT st.*, p.term_end_day
  FROM st CROSS JOIN params p
  WHERE st.status_day BETWEEN p.term_end_day - {_J6_WINDOW_DAYS}
                          AND p.term_end_day
),
ranked AS (
  SELECT w.o_custkey, w.o_orderkey, w.o_orderstatus, w.status_day,
         w.term_end_day - w.status_day AS days_before_term_end,
         row_number() OVER (PARTITION BY w.o_custkey
                            ORDER BY w.status_day DESC, w.o_orderkey ASC) AS rn
  FROM windowed w
)
SELECT r.o_custkey, r.o_orderkey, r.o_orderstatus, r.status_day,
       r.days_before_term_end, n.n_name AS nation_name
FROM ranked r
JOIN customer c ON c.c_custkey = r.o_custkey
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE r.rn = 1
"""


@register(
    "j6_scalar_cte_window",
    oracle=_J6_ORACLE,
    doc="J6 scalar-CTE cross join on parquet (reference shape:"
        " queries/office-candidates_by_congstatus.sql): data-derived"
        " 1-row term window broadcast into a BETWEEN predicate (J7),"
        " keep-first per entity (W3), dim left-join — the driver row"
        " the JDBC-backed vsdb twin cannot have",
)
def j6_scalar_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    dayno = lambda c: F.floor(F.unix_timestamp(c) / 86400.0).cast("bigint")  # noqa: E731
    params = o.agg(dayno(F.max("o_orderdate")).alias("term_end_day"))
    st = o.select(
        "o_custkey", "o_orderkey", "o_orderstatus",
        dayno(F.col("o_orderdate")).alias("status_day"),
    )
    windowed = st.crossJoin(F.broadcast(params)).where(
        F.col("status_day").between(
            F.col("term_end_day") - _J6_WINDOW_DAYS, F.col("term_end_day")
        )
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("status_day").desc(), F.col("o_orderkey").asc()
    )
    ranked = windowed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation_name")
    )
    return (
        ranked.join(cust, ranked["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"], "left")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            "status_day",
            (F.col("term_end_day") - F.col("status_day")).alias(
                "days_before_term_end"
            ),
            "nation_name",
        )
    )
