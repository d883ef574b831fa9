"""Scale diagnostics + data-layout queries.

Two operator families a 100 TB deployment runs *before* the expensive
jobs, to choose physical strategy:

- ``diag_key_skew``: per-key distribution report for a join/agg key —
  the pre-flight check that decides between a plain shuffle join,
  broadcast, or salting (the same decision SURVEY §4's CA/TX-dominant
  linkage blocks forced; see queries/linkage_demo's salted twin).
- ``layout_zorder_pruning``: Z-order (Morton) clustering vs linear
  single-column layout, measured by min/max-statistics pruning — the
  mechanism parquet row groups / Delta data-skipping use. The query
  computes, for the SAME file-count budget, how many "files" (buckets)
  a selective predicate on the SECOND dimension can skip under each
  layout: interleaved bits keep BOTH dimensions' min/max ranges tight,
  a linear sort keeps only the leading dimension tight.

Both are pure DataFrame aggregations — one keyed shuffle each side,
top-k via TakeOrdered (never a global sort), bit math in codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

# ---------------------------------------------------------------------------
# diag_key_skew: top-K heaviest join keys with their global share and
# skew factor (rows-at-key / mean-rows-per-key). One map-side-combinable
# groupBy; the totals side is a 1-row aggregate cross-joined broadcast;
# top-K compiles to TakeOrdered. At 100 TB this is the cheap scan you
# run to decide whether l_partkey needs salting before a join.
# ---------------------------------------------------------------------------

_SKEW_K = 10

_SKEW_ORACLE = f"""
WITH c AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_partkey
),
t AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM c
)
SELECT c.key, c.n_rows, t.n_keys,
       round(c.n_rows / CAST(t.total AS DOUBLE), 9) AS share,
       round(c.n_rows * t.n_keys / CAST(t.total AS DOUBLE), 6) AS skew_x
FROM c CROSS JOIN t
ORDER BY c.n_rows DESC, c.key
LIMIT {_SKEW_K}
"""


@register(
    "diag_key_skew",
    oracle=_SKEW_ORACLE,
    doc=f"join-key skew diagnostic: top-{_SKEW_K} heaviest l_partkey values"
        " with global share and skew factor; groupBy + broadcast totals"
        " + TakeOrdered",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    t = c.agg(
        F.sum("n_rows").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "key",
            "n_rows",
            "n_keys",
            F.round(F.col("n_rows") / F.col("total"), 9).alias("share"),
            F.round(F.col("n_rows") * F.col("n_keys") / F.col("total"), 6).alias(
                "skew_x"
            ),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(_SKEW_K)
    )


# ---------------------------------------------------------------------------
# layout_zorder_pruning: 8-bit Morton interleave of (l_partkey % 256,
# l_suppkey % 256). Bucket = top 8 bits of the 16-bit code, so each of
# the 256 buckets covers a 16x16 tile of (p, s) space; the linear layout
# sorts by p*256+s, whose top 8 bits are just p — same bucket count,
# same sizes, but every bucket spans ALL of s. The output is the
# two-layout pruning scorecard for the band predicate s IN [32, 47]:
# which buckets' [min_s, max_s] stats let the scan skip them entirely.
# ---------------------------------------------------------------------------

_BAND_LO, _BAND_HI = 32, 47
_BITS = 8


def _morton_sql(p: str, s: str) -> str:
    """DuckDB-side Morton code: bit i of p -> bit 2i, bit i of s -> 2i+1."""
    terms = [f"((({p} >> {i}) & 1) << {2 * i})" for i in range(_BITS)]
    terms += [f"((({s} >> {i}) & 1) << {2 * i + 1})" for i in range(_BITS)]
    return " + ".join(terms)


def _morton_col(p: Column, s: Column) -> Column:
    terms = [
        F.shiftleft(F.shiftright(p, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(_BITS)
    ] + [
        F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(_BITS)
    ]
    return reduce(lambda a, b: a + b, terms)


_ZORDER_ORACLE = f"""
WITH base AS (
  SELECT CAST(l_partkey % 256 AS INTEGER) AS p,
         CAST(l_suppkey % 256 AS INTEGER) AS s
  FROM lineitem
),
zb AS (
  SELECT ({_morton_sql("p", "s")}) >> {_BITS} AS bucket,
         COUNT(*) AS n, MIN(s) AS min_s, MAX(s) AS max_s
  FROM base GROUP BY 1
),
lb AS (
  SELECT p AS bucket, COUNT(*) AS n, MIN(s) AS min_s, MAX(s) AS max_s
  FROM base GROUP BY 1
),
score AS (
  SELECT 'zorder' AS layout, * FROM zb
  UNION ALL
  SELECT 'linear' AS layout, * FROM lb
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN max_s < {_BAND_LO} OR min_s > {_BAND_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS prunable_buckets,
       CAST(SUM(CASE WHEN max_s < {_BAND_LO} OR min_s > {_BAND_HI}
                     THEN n ELSE 0 END) AS BIGINT) AS rows_skipped,
       CAST(SUM(n) AS BIGINT) AS rows_total
FROM score GROUP BY layout
"""


@register(
    "layout_zorder_pruning",
    oracle=_ZORDER_ORACLE,
    doc="Z-order vs linear layout pruning scorecard: Morton-interleaved"
        " bucket stats let a second-dimension band predicate skip ~15/16"
        " of buckets; the linear layout skips zero",
)
def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_partkey") % 256).cast("int").alias("p"),
        (F.col("l_suppkey") % 256).cast("int").alias("s"),
    )
    zb = (
        base.select(
            F.shiftright(_morton_col(F.col("p"), F.col("s")), _BITS).alias("bucket"),
            "s",
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.min("s").alias("min_s"), F.max("s").alias("max_s"))
    )
    lb = (
        base.groupBy(F.col("p").alias("bucket"))
        .agg(F.count("*").alias("n"), F.min("s").alias("min_s"), F.max("s").alias("max_s"))
    )
    score = zb.select(F.lit("zorder").alias("layout"), "*").unionByName(
        lb.select(F.lit("linear").alias("layout"), "*")
    )
    prunable = (F.col("max_s") < _BAND_LO) | (F.col("min_s") > _BAND_HI)
    return score.groupBy("layout").agg(
        F.count("*").alias("n_buckets"),
        F.sum(prunable.cast("bigint")).alias("prunable_buckets"),
        F.sum(F.when(prunable, F.col("n")).otherwise(0)).alias("rows_skipped"),
        F.sum("n").alias("rows_total"),
    )
