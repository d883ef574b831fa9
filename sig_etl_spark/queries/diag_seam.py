"""Float-seam bisector diagnostics (round 7).

Four queries (sketch_quantile_hist/_calibration, orders_rfm_segmentation,
llm_source_drift) have repeatedly gone hash-red at the EXTERNAL driver
correctness gate while matching every local DuckDB configuration
bit-for-bit (sf0.001→sf1, local[7]/local[32], strict full-float-repr
hash). The builder cannot observe the driver environment, so this module
turns the next correctness file into a measurement instrument: one tiny
registered query PER SUSPECT CONSTRUCT, each emitting ~10 rows anchored
on a deterministic ``o_orderkey`` slice. Whichever diagnostics go red in
CORRECTNESS_r07.json identify the divergent construct(s) mechanically
and permanently — and the greens certify the constructs the round-7
rewrites now rely on.

Interpretation table (also in README.md):

- ``diag_seam_intmult_double`` red  -> the environment mangles
  integer-valued doubles (the only doubles r6's ``sketch_quantile_hist``
  emitted) — formatting/hashing, not arithmetic.
- ``diag_seam_plain_double`` red    -> even raw parquet doubles don't
  round-trip; every double-emitting query is exposed (control row —
  expected green, the pattern is driver-green elsewhere).
- ``diag_seam_round_cents`` red     -> ROUND(x*100) cents differ; the
  whole integer-cents family is exposed (expected green: construct is
  driver-green in events_seasonal_forecast and the TPC-H shapes).
- ``diag_seam_cum_window`` red      -> cumulative-sum window frames
  (ROWS BETWEEN ... CURRENT ROW) + MIN(CASE) rank picks differ — the
  only construct unique to the two red sketch queries' oracles.
- ``diag_seam_qdisc_bigint`` red    -> the engine discrete-percentile
  element convention differs on INTEGER input (r6 RFM's construct).
- ``diag_seam_qdisc_double`` red    -> same on DOUBLE input (the
  construct driver-green in events_quantiles — expected green).
- ``diag_seam_div_double`` red      -> a single IEEE division of exact
  integers differs (the chi-square expected-value term).
- ``diag_seam_fold_double`` red     -> the order-fixed float fold
  (Spark F.aggregate vs DuckDB list_reduce) differs — r6
  llm_source_drift's construct.
- ``diag_seam_decimal_accum`` red   -> double→DECIMAL(38,10) pinning +
  exact decimal sum differs — would invalidate the round-7 drift fix.
- ``diag_seam_datediff`` red        -> engine day-difference conventions
  differ on timestamps (r6 RFM's recency construct).
- ``diag_seam_neg_div`` red         -> negative-numerator integer division
  (or %) floors instead of truncating — a DuckDB-version seam (1.0
  truncates, later releases floor `//`); production queries are immune
  by the non-negative-numerator discipline (queries/__init__.py).

Every query is O(1): a 10–100-row TakeOrdered slice of ``orders``, no
shuffle wider than one aggregate. They stay registered permanently —
they cost nothing and pin the constructs against engine upgrades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from sig_etl_spark.queries import RegisteredQuery, register
from sig_etl_spark.tables import load_table

# Deterministic anchor: the N lowest orderkeys (orderkeys are unique, so
# ORDER BY o_orderkey LIMIT n is total-order deterministic on any engine).
_SLICE_SQL = "SELECT * FROM orders ORDER BY o_orderkey LIMIT {n}"


def _slice(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    return load_table(spark, sf_dir, "orders").orderBy("o_orderkey").limit(n)


# --- 1. integer-valued doubles --------------------------------------------

_INTMULT_ORACLE = f"""
SELECT o_orderkey,
       CAST((o_orderkey % 9 + 1) * 10000.0 AS DOUBLE) AS edge_double,
       CAST((o_orderkey % 9 + 1) * 1000000 AS BIGINT) AS edge_cents
FROM ({_SLICE_SQL.format(n=10)}) t
"""


@register(
    "diag_seam_intmult_double",
    oracle=_INTMULT_ORACLE,
    doc="seam bisector: integer-valued double (k*10000.0) next to its"
        " bigint-cents twin — isolates the only double construct r6's"
        " sketch_quantile_hist emitted",
)
def diag_seam_intmult_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 10)
    k = F.col("o_orderkey") % 9 + 1
    return s.select(
        "o_orderkey",
        (k * F.lit(10000.0)).cast("double").alias("edge_double"),
        (k * F.lit(1_000_000)).cast("bigint").alias("edge_cents"),
    )


# --- 2. raw parquet doubles (control) -------------------------------------

_PLAIN_ORACLE = f"""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price_double
FROM ({_SLICE_SQL.format(n=10)}) t
"""


@register(
    "diag_seam_plain_double",
    oracle=_PLAIN_ORACLE,
    doc="seam bisector control: raw parquet doubles passed through"
        " untouched — red here means every double-emitting query is"
        " exposed at the driver boundary",
)
def diag_seam_plain_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice(spark, sf_dir, 10).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price_double")
    )


# --- 3. ROUND(x*100) cents -------------------------------------------------

_CENTS_ORACLE = f"""
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
FROM ({_SLICE_SQL.format(n=10)}) t
"""


@register(
    "diag_seam_round_cents",
    oracle=_CENTS_ORACLE,
    doc="seam bisector: ROUND(price*100) bigint cents — the integer-cents"
        " convention the revenue/RFM/calibration family rests on",
)
def diag_seam_round_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice(spark, sf_dir, 10).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )


# --- 4. cumulative window frame + MIN(CASE) rank pick ----------------------

_CUMWIN_ORACLE = f"""
WITH s AS ({_SLICE_SQL.format(n=100)}),
hist AS (
  SELECT o_orderkey % 7 AS bin, COUNT(*) AS n FROM s GROUP BY 1
),
cum AS (
  SELECT bin, n,
         SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         SUM(n) OVER () AS total
  FROM hist
)
SELECT CAST(MAX(total) AS BIGINT) AS total,
       CAST(MIN(CASE WHEN cum * 2 >= total THEN bin END) AS BIGINT) AS p50_bin,
       CAST(MIN(CASE WHEN cum * 10 >= total * 9 THEN bin END) AS BIGINT) AS p90_bin
FROM cum
"""


@register(
    "diag_seam_cum_window",
    oracle=_CUMWIN_ORACLE,
    doc="seam bisector: all-integer cumulative-sum window (ROWS BETWEEN)"
        " + MIN(CASE) rank pick — the construct unique to the red sketch"
        " oracles, isolated from any double",
)
def diag_seam_cum_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 100)
    hist = s.groupBy((F.col("o_orderkey") % 7).alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    return cum.agg(
        F.max("total").cast("bigint").alias("total"),
        F.min(F.when(F.col("cum") * 2 >= F.col("total"), F.col("bin")))
        .cast("bigint")
        .alias("p50_bin"),
        F.min(F.when(F.col("cum") * 10 >= F.col("total") * 9, F.col("bin")))
        .cast("bigint")
        .alias("p90_bin"),
    )


# --- 5/6. engine discrete-percentile element pick --------------------------

_QDISC_INT_ORACLE = f"""
WITH s AS ({_SLICE_SQL.format(n=100)})
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(quantile_disc(o_orderkey % 97, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(o_orderkey % 97, 0.5) AS BIGINT) AS q50,
       CAST(quantile_disc(o_orderkey % 97, 0.75) AS BIGINT) AS q75,
       CAST(quantile_disc(o_orderkey % 97, 0.9) AS BIGINT) AS q90,
       CAST(quantile_disc(o_orderkey % 97, 0.99) AS BIGINT) AS q99
FROM s
"""


@register(
    "diag_seam_qdisc_bigint",
    oracle=_QDISC_INT_ORACLE,
    doc="seam bisector: engine discrete percentile (percentile_disc vs"
        " quantile_disc) over BIGINT input — r6 RFM's boundary construct",
)
def diag_seam_qdisc_bigint(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 100).select(
        (F.col("o_orderkey") % 97).alias("v")
    )
    return s.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY v)")
            .cast("bigint")
            .alias(f"q{int(q * 100)}")
            for q in (0.25, 0.5, 0.75, 0.9, 0.99)
        ],
    )


_QDISC_DBL_ORACLE = f"""
WITH s AS ({_SLICE_SQL.format(n=100)})
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       quantile_disc(CAST(o_totalprice AS DOUBLE), 0.25) AS q25,
       quantile_disc(CAST(o_totalprice AS DOUBLE), 0.5) AS q50,
       quantile_disc(CAST(o_totalprice AS DOUBLE), 0.75) AS q75,
       quantile_disc(CAST(o_totalprice AS DOUBLE), 0.9) AS q90,
       quantile_disc(CAST(o_totalprice AS DOUBLE), 0.99) AS q99
FROM s
"""


@register(
    "diag_seam_qdisc_double",
    oracle=_QDISC_DBL_ORACLE,
    doc="seam bisector control: engine discrete percentile over DOUBLE"
        " input — the construct driver-green in events_quantiles",
)
def diag_seam_qdisc_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 100).select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    return s.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY v)").alias(
                f"q{int(q * 100)}"
            )
            for q in (0.25, 0.5, 0.75, 0.9, 0.99)
        ],
    )


# --- 7. one IEEE division of exact integers ---------------------------------

_DIV_ORACLE = f"""
SELECT o_orderkey,
       CAST(o_orderkey * 7 + 3 AS DOUBLE) / CAST(97 AS DOUBLE) AS expv,
       (CAST(o_orderkey % 13 AS DOUBLE)
          - CAST(o_orderkey * 7 + 3 AS DOUBLE) / CAST(97 AS DOUBLE))
       * (CAST(o_orderkey % 13 AS DOUBLE)
          - CAST(o_orderkey * 7 + 3 AS DOUBLE) / CAST(97 AS DOUBLE))
       / (CAST(o_orderkey * 7 + 3 AS DOUBLE) / CAST(97 AS DOUBLE)) AS chi_term
FROM ({_SLICE_SQL.format(n=10)}) t
"""


@register(
    "diag_seam_div_double",
    oracle=_DIV_ORACLE,
    doc="seam bisector: single IEEE division of exact integers and the"
        " d*d/e chi-square term shape — the arithmetic inside"
        " llm_source_drift, isolated from folding and output typing",
)
def diag_seam_div_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 10)
    expv = (F.col("o_orderkey") * 7 + 3).cast("double") / F.lit(97).cast("double")
    d = (F.col("o_orderkey") % 13).cast("double") - expv
    return s.select(
        "o_orderkey", expv.alias("expv"), (d * d / expv).alias("chi_term")
    )


# --- 8. order-fixed float fold ----------------------------------------------

_FOLD_ORACLE = f"""
WITH s AS ({_SLICE_SQL.format(n=10)}),
terms AS (
  SELECT o_orderkey % 4 AS g, o_orderkey,
         CAST(o_orderkey * 7 + 3 AS DOUBLE) / CAST(97 AS DOUBLE) AS term
  FROM s
)
SELECT g,
       list_reduce(list_prepend(0.0, list(term ORDER BY o_orderkey)),
                   (acc, x) -> acc + x) AS folded
FROM terms GROUP BY g
"""


@register(
    "diag_seam_fold_double",
    oracle=_FOLD_ORACLE,
    doc="seam bisector: order-fixed left fold of division doubles (Spark"
        " F.aggregate vs DuckDB list_reduce/list_prepend) — r6"
        " llm_source_drift's accumulation construct",
)
def diag_seam_fold_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 10)
    term = (F.col("o_orderkey") * 7 + 3).cast("double") / F.lit(97).cast("double")
    rows = s.select(
        (F.col("o_orderkey") % 4).alias("g"),
        F.struct(F.col("o_orderkey"), term.alias("term")).alias("kv"),
    )
    return rows.groupBy("g").agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list("kv")), lambda kv: kv["term"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("folded")
    )


# --- 9. double -> DECIMAL(38,10) pin + exact sum ----------------------------

_DECACC_ORACLE = f"""
WITH s AS ({_SLICE_SQL.format(n=10)}),
terms AS (
  SELECT o_orderkey % 4 AS g,
         CAST(CAST(o_orderkey * 7 + 3 AS DOUBLE) / CAST(97 AS DOUBLE)
              AS DECIMAL(38,10)) AS term
  FROM s
)
SELECT g, CAST(ROUND(SUM(term) * 1000) AS BIGINT) AS sum_milli
FROM terms GROUP BY g
"""


@register(
    "diag_seam_decimal_accum",
    oracle=_DECACC_ORACLE,
    doc="seam bisector: double pinned to DECIMAL(38,10), exact decimal"
        " sum, bigint millis out — the round-7 llm_source_drift"
        " construct, certified by this row",
)
def diag_seam_decimal_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 10)
    term = (
        (F.col("o_orderkey") * 7 + 3).cast("double") / F.lit(97).cast("double")
    ).cast("decimal(38,10)")
    return (
        s.select((F.col("o_orderkey") % 4).alias("g"), term.alias("term"))
        .groupBy("g")
        .agg(F.round(F.sum("term") * 1000).cast("bigint").alias("sum_milli"))
    )


# --- 10. engine day-difference convention -----------------------------------

_DATEDIFF_ORACLE = f"""
WITH s AS ({_SLICE_SQL.format(n=10)}),
m AS (SELECT MAX(o_orderdate) AS dmax FROM orders)
SELECT s.o_orderkey,
       CAST(date_diff('day', s.o_orderdate, m.dmax) AS BIGINT)
         AS datediff_days,
       CAST(floor(epoch(m.dmax) / 86400.0)
            - floor(epoch(s.o_orderdate) / 86400.0) AS BIGINT)
         AS epoch_days
FROM s CROSS JOIN m
"""


@register(
    "diag_seam_datediff",
    oracle=_DATEDIFF_ORACLE,
    doc="seam bisector: engine date_diff('day') on timestamps next to"
        " convention-free epoch-day subtraction — r6 RFM's recency"
        " construct and its round-7 replacement side by side",
)
def diag_seam_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _slice(spark, sf_dir, 10)
    m = load_table(spark, sf_dir, "orders").agg(
        F.max("o_orderdate").alias("dmax")
    )
    dayno = lambda c: F.floor(F.unix_timestamp(c) / 86400.0)  # noqa: E731
    return s.crossJoin(F.broadcast(m)).select(
        "o_orderkey",
        F.datediff(F.col("dmax"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("datediff_days"),
        (dayno(F.col("dmax")) - dayno(F.col("o_orderdate")))
        .cast("bigint")
        .alias("epoch_days"),
    )


# --- 11. negative integer division (round-7 addition) ----------------------
# This sandbox's DuckDB 1.0.0 truncates `//` toward zero (probed:
# -7//2 = -3), matching Spark's `div` — but later DuckDB releases moved
# `//` to floor semantics. If the driver's DuckDB floors, this row goes
# red and mechanically identifies the version seam; the repo's own
# discipline (non-negative numerators everywhere, abs-then-resign in
# llm_langid_agreement) keeps every production query immune either way.

_NEG_DIV_ORACLE = f"""
SELECT o_orderkey,
       CAST((-(o_orderkey % 9) - 1) // 2 AS BIGINT) AS neg_div_2,
       CAST((o_orderkey % 9 + 1) // 2 AS BIGINT) AS pos_div_2,
       CAST((-(o_orderkey % 9) - 1) % 4 AS BIGINT) AS neg_mod_4
FROM ({_SLICE_SQL.format(n=10)}) t
"""


@register(
    "diag_seam_neg_div",
    oracle=_NEG_DIV_ORACLE,
    doc="seam bisector: negative-numerator integer division and modulo —"
        " truncate (DuckDB 1.0 `//`, Spark div) vs floor (later DuckDB"
        " `//`) version seam; positives as the control column",
)
def diag_seam_neg_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice(spark, sf_dir, 10).select(
        "o_orderkey",
        F.expr("cast((-(o_orderkey % 9) - 1) div 2 as bigint)").alias("neg_div_2"),
        F.expr("cast((o_orderkey % 9 + 1) div 2 as bigint)").alias("pos_div_2"),
        F.expr("cast((-(o_orderkey % 9) - 1) % 4 as bigint)").alias("neg_mod_4"),
    )


# --- 12. HUGEINT output seam (round-8 addition) -----------------------------
# Round-8 root-cause finding for the five r5–r7 driver hash-reds: each
# emitted exactly one output column where DuckDB's SUM(BIGINT) had
# widened to HUGEINT (int128). DuckDB's HUGEINT->pandas bridge
# materializes float64, so a strict value canonicalizer hashes the
# oracle cell as "1000.0" against Spark's bigint "1000" — rows and
# column names still match, only the value hash reds. The class is
# invisible to any probe whose oracle casts its aggregates (all 10 r7
# probes did), and tools/verify_local.py's old canon_cell masked it
# locally by collapsing integer-valued floats (removed in round 8).
#
# This PAIR turned CORRECTNESS_r08 into the proof:
# - diag_seam_hugeint_raw: the oracle deliberately leaves SUM(BIGINT)
#   uncast — EXPECTED RED at any driver whose canonicalizer does not
#   collapse integer-valued floats (ours evidently does not). Red here
#   + green fixed twins = root cause confirmed mechanically.
# - diag_seam_hugeint_cast: identical query with CAST(... AS BIGINT) —
#   expected green; certifies the fix pattern applied to the five
#   production oracles (sketch_demo.py, relational.py, llm_text.py).
#
# DEREGISTERED round 9 (VERDICT r8 task 2): the pair served its purpose
# (red/green proof recorded in CORRECTNESS_r08) and the class is now
# mechanically guarded by tools/dtype_seam_scan.py + tests/
# test_dtype_seam.py. Keeping the raw probe registered would make the
# correctness file permanently non-all-green for no new information.
# The pair lives on here as PYTEST FIXTURES (PROBE_QUERIES) exercised by
# tests/test_dtype_seam.py every run — same builders, same oracles, just
# no registry entry and therefore no driver row.

PROBE_QUERIES: dict[str, "RegisteredQuery"] = {}


def _probe(name: str, oracle: str | None, doc: str = ""):
    """Like queries.register, but into the test-only PROBE_QUERIES dict."""

    def deco(fn):
        PROBE_QUERIES[name] = RegisteredQuery(
            name=name, builder=fn, oracle=oracle, doc=doc
        )
        return fn

    return deco

_HUGEINT_RAW_ORACLE = f"""
SELECT CAST(o_orderkey % 3 AS BIGINT) AS grp,
       SUM(o_orderkey) AS key_sum
FROM ({_SLICE_SQL.format(n=10)}) t
GROUP BY 1 ORDER BY 1
"""

_HUGEINT_CAST_ORACLE = f"""
SELECT CAST(o_orderkey % 3 AS BIGINT) AS grp,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM ({_SLICE_SQL.format(n=10)}) t
GROUP BY 1 ORDER BY 1
"""


@_probe(
    "diag_seam_hugeint_raw",
    oracle=_HUGEINT_RAW_ORACLE,
    doc="seam bisector: UNCAST SUM(BIGINT) oracle output (DuckDB widens"
        " to HUGEINT, pandas bridge makes it float64) — EXPECTED RED at"
        " a strict-canonicalizer driver; red here + green '_cast' twin"
        " mechanically proved the r5–r7 red-class root cause in"
        " CORRECTNESS_r08; pytest fixture since round 9",
)
def diag_seam_hugeint_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _slice(spark, sf_dir, 10)
        .groupBy((F.col("o_orderkey") % 3).cast("bigint").alias("grp"))
        .agg(F.sum("o_orderkey").alias("key_sum"))
        .orderBy("grp")
    )


@_probe(
    "diag_seam_hugeint_cast",
    oracle=_HUGEINT_CAST_ORACLE,
    doc="seam bisector control: the same SUM(BIGINT) with the oracle-side"
        " CAST(... AS BIGINT) fix — expected green; certifies the fix"
        " applied to the five formerly-red production oracles; pytest"
        " fixture since round 9",
)
def diag_seam_hugeint_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _slice(spark, sf_dir, 10)
        .groupBy((F.col("o_orderkey") % 3).cast("bigint").alias("grp"))
        .agg(F.sum("o_orderkey").alias("key_sum"))
        .orderBy("grp")
    )
