"""TPC-H shape completion (round 7): Q4, Q6-Q9, Q11, Q12, Q14-Q17, Q19, Q20.

With these, every TPC-H query shape expressible on the fixture tables has
a registered twin (Q1 ~ agg_pricing_summary; Q2/Q3/Q5/Q10/Q13/Q18/Q21/Q22
landed in earlier rounds). Each re-expresses a reference behavior class —
EXISTS/NOT-EXISTS gating, conditional counts, scalar-subquery thresholds,
disjunctive predicates — over the driver's tables so DuckDB can oracle it:
the reference's SQL surface does exactly these shapes (correlated EXISTS
filter in queries/election_candidates_by_electionyear.sql:8-48, conditional
counts + pct in votervoice/transform.py:77-86 and match.py:127-140, scalar
param derivation in national/_1034/__main__.py:91-121).

Fixture adaptations (the driver's tables carry no partsupp /
commitdate / shipmode / container columns): "late" is shipped > N days
after the order date (same inequality class as Q21's round-6 adaptation);
inventory quantities derive from per-(supplier, part) lineitem totals;
ship-mode buckets derive from ship-latency intervals.

Determinism discipline (float-seam hardened, same as the round-7 rewrites):
every money column is bigint cents via ROUND(x*100); every ratio is an
integer `div` (permille) of two bigint sums — NO double ever reaches the
output schema, and no engine percentile/AVG convention is involved.

Scale notes are per query; the shared rules: only fixed-cardinality dims
(nation, region) and 1-row aggregates are broadcast — customer, supplier,
part, orders grow with the corpus and are left to AQE (the lint in
tests/test_plans.py bans forcing them); every aggregate is map-side
combinable before its shuffle; date/brand/size predicates sit directly on
the scans so parquet row-group pruning sees them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


def _rev_cents() -> F.Column:
    # ROUND(extendedprice * (1 - discount) * 100): identical op order to
    # the oracle text, same IEEE sequence both engines (the convention
    # j_q3/j_q10/j_q18 proved driver-green in rounds 5-6).
    return F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("bigint")


# ---------------------------------------------------------------------------
# Q4 shape: priority counts of orders with at least one late line — the
# canonical correlated EXISTS, expressed as a left-semi join whose
# condition spans both sides (lateness compares l_shipdate to the outer
# row's o_orderdate). Scale: orders is date-pruned at the scan before
# anything joins; the semi join shuffles on orderkey and keeps no
# lineitem payload; the final groupBy is 5 groups, map-side combinable.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register(
    "j_q4_order_priority",
    oracle=_Q4_ORACLE,
    doc="TPC-H Q4 shape: correlated EXISTS as a mixed-condition left-semi"
        " join (late line within the half-year window), priority counts —"
        " all-integer output",
)
def j_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q6 shape: the pure scan-filter-aggregate forecast query — no join at
# all. Scale: this is the predicate-pushdown showcase; all three filters
# sit on the lineitem scan (date range + integer-cent discount band +
# quantity cap), the sum is a partial aggregate per partition and a
# 1-row final — zero shuffle beyond the single-row exchange. Discount
# membership is tested on ROUND(discount*100) BETWEEN 5 AND 7 so no
# IEEE boundary comparison is involved on either engine.
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS promo_revenue_cents,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(l_quantity AS BIGINT) < 24
"""


@register(
    "j_q6_forecast_revenue",
    oracle=_Q6_ORACLE,
    doc="TPC-H Q6 shape: scan-filter-aggregate with every predicate on"
        " the scan (date + integer-cent discount band + quantity cap);"
        " bigint cents, 1-row output",
)
def j_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & disc_pct.between(5, 7)
            & (F.col("l_quantity").cast("bigint") < 24)
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
                  .cast("bigint"))
            .cast("bigint")
            .alias("promo_revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape: bilateral shipping volume between two nations by ship year.
# Scale: supplier and customer are each reduced FIRST by a broadcast
# join against the 2-row filtered nation dim (a 2/25 selectivity cut
# before any fact-side work); lineitem then joins the reduced supplier
# set (AQE decides broadcast vs shuffle — supplier grows with the
# corpus), orders joins the reduced customer set, and the two meet on
# one orderkey shuffle. The 4-group aggregate is map-side combinable.
# ---------------------------------------------------------------------------

_Q7_NATION_A = "NATION_3"
_Q7_NATION_B = "NATION_8"

_Q7_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS volume_cents,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE ((sn.n_name = '{_Q7_NATION_A}' AND cn.n_name = '{_Q7_NATION_B}')
    OR (sn.n_name = '{_Q7_NATION_B}' AND cn.n_name = '{_Q7_NATION_A}'))
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY sn.n_name, cn.n_name, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


@register(
    "j_q7_nation_volume",
    oracle=_Q7_ORACLE,
    doc="TPC-H Q7 shape: bilateral nation-pair volume by ship year;"
        " nation dim broadcast prunes supplier/customer before the fact"
        " joins; bigint cents",
)
def j_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_Q7_NATION_A, _Q7_NATION_B)
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(
            ((F.col("supp_nation") == _Q7_NATION_A)
             & (F.col("cust_nation") == _Q7_NATION_B))
            | ((F.col("supp_nation") == _Q7_NATION_B)
               & (F.col("cust_nation") == _Q7_NATION_A))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(_rev_cents()).cast("bigint").alias("volume_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share — one nation's slice of a region's
# spend on a part type, by order year. The classic CASE-inside-SUM
# share, emitted as integer permille via bigint `div` (no double
# division on either engine). Scale: region⋈nation is broadcast (fixed
# 25/5 rows) to prune customer; part is type-filtered before the join;
# the only big shuffles are the two fact joins (partkey, orderkey);
# share arithmetic happens on 2 rows.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
WITH sales AS (
  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END)
            * 1000 // SUM(cents) AS BIGINT) AS share_permille
FROM sales
GROUP BY order_year
ORDER BY order_year
"""


@register(
    "j_q8_market_share",
    oracle=_Q8_ORACLE,
    doc="TPC-H Q8 shape: one nation's permille share of a region's"
        " part-type spend by year; integer div share, bigint cents,"
        " region/nation broadcast pruning",
)
def j_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nationkey"))
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations),
              F.col("c_nationkey") == F.col("cust_nationkey"))
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    sales = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            _rev_cents().alias("cents"),
            "supp_nation",
        )
    )
    return (
        sales.groupBy("order_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("cents"))
                  .otherwise(F.lit(0)))
            .cast("bigint")
            .alias("nation_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            "order_year",
            "nation_cents",
            "total_cents",
            F.expr("nation_cents * 1000 div total_cents")
            .cast("bigint")
            .alias("share_permille"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year. The
# fixture has no partsupp.ps_supplycost, so cost is modeled as 10% of
# the part's retail price per unit — the per-row profit expression
# keeps Q9's structure (revenue minus quantity-scaled cost) in exact
# bigint-cent arithmetic: rev_cents - (retail_cents * qty) div 10.
# Scale: the %red% name filter prunes part before the join; nation is
# broadcast; the two fact shuffles (partkey, orderkey) dominate and are
# unavoidable for this shape; 175-group combinable aggregate.
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT sn.n_name AS nation, CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)
              - (CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT)) // 10) AS BIGINT)
         AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, order_year
ORDER BY nation, order_year DESC
"""


@register(
    "j_q9_product_profit",
    oracle=_Q9_ORACLE,
    doc="TPC-H Q9 shape: profit (revenue minus unit-cost-scaled"
        " quantity, exact bigint cents with integer div) by supplier"
        " nation and order year over name-filtered parts",
)
def j_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", "p_retailprice")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("order_year"),
            _rev_cents().alias("rev_cents"),
            _cents("p_retailprice").alias("retail_cents"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .select(
            "nation",
            "order_year",
            F.expr("rev_cents - (retail_cents * qty) div 10").alias("profit"),
        )
    )
    return (
        rows.groupBy("nation", "order_year")
        .agg(F.sum("profit").cast("bigint").alias("profit_cents"))
        .orderBy(F.asc("nation"), F.desc("order_year"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: important stock — per-part inventory value within one
# nation's suppliers, kept when the part's value exceeds a fixed
# fraction of the nation total. The scalar subquery becomes a 1-row
# aggregate broadcast-cross-joined into the per-part frame, and the
# fraction test is integer cross-multiplication (value*1000 > total),
# the Q22 convention — no division anywhere. Scale: nation broadcast
# prunes supplier, one partkey shuffle builds the value frame, and the
# threshold join is size-1 by construction.
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH val AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
), tot AS (SELECT SUM(value_cents) AS total_cents FROM val)
SELECT v.l_partkey AS partkey, v.value_cents
FROM val v, tot t
WHERE v.value_cents * 1000 > t.total_cents
ORDER BY v.value_cents DESC, partkey
"""


@register(
    "j_q11_important_stock",
    oracle=_Q11_ORACLE,
    doc="TPC-H Q11 shape: per-part value within one nation vs a scalar"
        " total threshold — 1-row aggregate broadcast + integer"
        " cross-multiplication, no division",
)
def j_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_7"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    val = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).cast("bigint").alias("value_cents"))
    )
    tot = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(F.col("l_partkey").alias("partkey"), "value_cents")
        .orderBy(F.desc("value_cents"), F.asc("partkey"))
    )


# ---------------------------------------------------------------------------
# Q12 shape: priority mix by ship-latency bucket. The fixture has no
# l_shipmode, so the grouping key is the latency class (shipped within
# 30 / 90 days of the order date) — computed with the same
# timestamp + INTERVAL comparisons as Q21's lateness (no datediff
# convention involved). Scale: date filter on the lineitem scan, one
# orderkey shuffle, 3-group combinable conditional counts.
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY THEN 'FAST'
            WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY ship_bucket
ORDER BY ship_bucket
"""


@register(
    "j_q12_latency_priority",
    oracle=_Q12_ORACLE,
    doc="TPC-H Q12 shape: high/low-priority line counts by ship-latency"
        " bucket (interval comparisons, no datediff); all-integer output",
)
def j_q12_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    ).select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    bucket = (
        F.when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
            "FAST",
        )
        .when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
            "NORMAL",
        )
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share for one ship month — CASE-inside-SUM
# over a part join, share as integer permille div. Scale: the month
# filter prunes lineitem at the scan to ~1/80 of rows before the
# partkey join; 1-row output.
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 100) AS BIGINT) ELSE 0 END) * 1000
            // SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS promo_permille
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""


@register(
    "j_q14_promo_share",
    oracle=_Q14_ORACLE,
    doc="TPC-H Q14 shape: promo-type permille share of one month's"
        " revenue; integer div share over bigint cents",
)
def j_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        _rev_cents().alias("cents"),
        (F.col("p_type") == "PROMO").alias("is_promo"),
    )
    return (
        joined.agg(
            F.sum(F.when(F.col("is_promo"), F.col("cents")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("promo_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.expr("promo_cents * 1000 div total_cents")
            .cast("bigint")
            .alias("promo_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue — the scalar MAX
# subquery becomes a 1-row aggregate broadcast-cross-joined back into
# the per-supplier revenue frame (ties all survive, as in the spec).
# Scale: one suppkey shuffle for the revenue frame; the max and the
# equality filter touch |suppliers| rows; supplier join is AQE's call.
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
ORDER BY s.s_suppkey
"""


@register(
    "j_q15_top_supplier",
    oracle=_Q15_ORACLE,
    doc="TPC-H Q15 shape: max quarterly supplier revenue via 1-row"
        " aggregate broadcast (ties kept); bigint cents",
)
def j_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_cents()).cast("bigint").alias("total_cents"))
    )
    best = rev.agg(F.max("total_cents").alias("best_cents"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_cents") == F.col("best_cents"))
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_cents")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape: how many distinct suppliers can deliver each surviving
# (brand, type, size) combination, excluding flagged suppliers — the
# NOT IN subquery becomes a left-anti join. The fixture's supplier
# table has no comment column, so "flagged" is a negative account
# balance. Scale: part predicates prune before the join; the anti-join
# side is the flagged subset only; COUNT(DISTINCT suppkey) shuffles
# once on the 3-column group key.
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)

_Q16_ORACLE = f"""
SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'MEDIUM'
  AND p.p_size IN {_Q16_SIZES}
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register(
    "j_q16_supplier_variety",
    oracle=_Q16_ORACLE,
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute"
        " combo with a NOT-IN exclusion as a left-anti join;"
        " all-integer output",
)
def j_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    kept = li.join(flagged, li["l_suppkey"] == flagged["s_suppkey"], "left_anti")
    return (
        kept.join(p, kept["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 shape: revenue locked in small-quantity orders of one brand —
# the correlated AVG subquery de-correlated into a per-part aggregate,
# with the 20%-of-average test as integer cross-multiplication
# (qty * 5 * cnt < sum_qty ⇔ qty < 0.2 * avg). Scale: the brand filter
# prunes part FIRST and semi-reduces lineitem before the per-part
# aggregate (group keys include partkey, so restricting to the brand's
# partkeys upfront is exact); avg_yearly is an integer div 7.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) // 7 AS BIGINT)
         AS avg_yearly_cents,
       COUNT(*) AS n_rows
FROM lineitem l
JOIN per_part a ON a.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND CAST(l.l_quantity AS BIGINT) * 5 * a.cnt < a.sum_qty
"""


@register(
    "j_q17_small_qty_revenue",
    oracle=_Q17_ORACLE,
    doc="TPC-H Q17 shape: below-20%-of-part-average quantity revenue via"
        " integer cross-multiplication (no division, no AVG); brand"
        " filter semi-reduces lineitem before the per-part aggregate",
)
def j_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    brand_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Exact reduction: per_part keys are partkeys; only Brand#3 partkeys
    # are consumed downstream, so both the aggregate and the probe can be
    # restricted to them upfront.
    li_b = li.join(brand_parts, li["l_partkey"] == brand_parts["p_partkey"])
    per_part = li_b.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = li_b.join(
        per_part, li_b["l_partkey"] == per_part["a_partkey"]
    ).filter(F.col("l_quantity").cast("bigint") * 5 * F.col("cnt") < F.col("sum_qty"))
    return small.agg(
        F.sum(_cents("l_extendedprice")).cast("bigint").alias("total_cents"),
        F.expr(
            "cast(sum(cast(round(l_extendedprice * 100) as bigint)) div 7 as bigint)"
        ).alias("avg_yearly_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Q19 shape: the disjunctive (brand, size, quantity) OR-blocks — the
# classic test that a planner turns a join-plus-OR filter into a
# pruned scan. Scale: part is pre-filtered to the three brands (the
# union of the OR branches) before the partkey join; the OR itself
# runs post-join in codegen; 1-row output.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
       AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
       AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 30
       AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 45)
"""


@register(
    "j_q19_disjunctive_revenue",
    oracle=_Q19_ORACLE,
    doc="TPC-H Q19 shape: three (brand, size, quantity) OR-blocks across"
        " a part join, brand-union pre-filter before the join; bigint"
        " cents",
)
def j_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    block = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10)
         & qty.between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 20)
           & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30)
           & qty.between(20, 45))
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(block)
        .agg(
            F.sum(_rev_cents()).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: suppliers in one region holding excess stock of a part
# family — nested EXISTS over per-(supplier, part) shipped totals. The
# fixture has no partsupp.availqty, so "excess" is: more than half of
# the part's lifetime volume from this supplier shipped in the recent
# year (integer cross-multiplication again). Scale: lineitem is
# semi-reduced by the name-filtered part set BEFORE the
# (suppkey, partkey) aggregate (group keys contain partkey — exact);
# the EXISTS is a left-semi join on suppkey; nation broadcast.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS BIGINT)) AS total_qty,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS recent_qty
  FROM lineitem GROUP BY l_suppkey, l_partkey
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = 2
  AND EXISTS (SELECT 1 FROM shipped sh
              JOIN part p ON p.p_partkey = sh.l_partkey
              WHERE sh.l_suppkey = s.s_suppkey AND p.p_name LIKE 'small%'
                AND sh.recent_qty * 2 > sh.total_qty)
ORDER BY s.s_suppkey
"""


@register(
    "j_q20_excess_stock",
    oracle=_Q20_ORACLE,
    doc="TPC-H Q20 shape: nested EXISTS over per-(supplier, part)"
        " shipped totals with a recent-volume cross-multiplication test;"
        " part-name semi-reduction before the aggregate",
)
def j_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    # Exact reduction: shipped is keyed by (suppkey, partkey) and only
    # 'small%' partkeys are consumed by the EXISTS, so the aggregate is
    # restricted to them upfront.
    li_small = li.join(small_parts, li["l_partkey"] == small_parts["p_partkey"])
    recent = (
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    shipped = li_small.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        F.sum(
            F.when(recent, F.col("l_quantity").cast("bigint")).otherwise(F.lit(0))
        ).alias("recent_qty"),
    )
    excess_suppliers = (
        shipped.filter(F.col("recent_qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_regionkey") == 2
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    return (
        s.join(
            excess_suppliers,
            s["s_suppkey"] == excess_suppliers["l_suppkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name", "nation")
        .orderBy("s_suppkey")
    )
