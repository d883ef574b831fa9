"""Sketch-family queries: HLL distinct, count-min heavy hitters, bloom join.

These are the approximate/streaming-summary operators a 100 TB engine
needs when exact answers are shuffle-bound: COUNT(DISTINCT) over a
high-cardinality column shuffles every distinct key, while the HLL sketch
shuffles 64 registers per group; exact heavy-hitters shuffle every key,
while CMS shuffles d*w counters; a selective dimension filter can prune a
fact scan before the join shuffle via a broadcast bloom filter (Spark's
own runtime row-level filtering made explicit).

Every query is fully oracle-checked because the hashes are portable md5
(functions/hashing.py): DuckDB re-derives register indexes, ranks, cells
and bit positions from the same bits, so even the *estimates* hash-match.

Reference scope note: the reference engine has no sketches (it is an exact
small-data ETL; SURVEY §2.6) — these extend the engine for the LLM-scale
brief, same as the dedup/ANN family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from sig_etl_spark import sketches as SK
from sig_etl_spark.llm import text_analysis as T
from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')"

# ---------------------------------------------------------------------------
# HLL: distinct tokens per source. Exact countDistinct rides along so the
# output row shows estimate vs truth (and the oracle re-derives both).
# ---------------------------------------------------------------------------

_HLL_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({_TOKS}) AS token FROM documents
),
hll AS (
{SK.hll_oracle_sql("tok", "token", ["source"])}
),
exact AS (
  SELECT source, COUNT(DISTINCT token) AS exact_distinct FROM tok GROUP BY source
)
SELECT hll.source, n_zero_regs, reg_sum, hll_distinct, exact_distinct
FROM hll JOIN exact ON hll.source = exact.source
"""


@register(
    "sketch_hll_distinct",
    oracle=_HLL_ORACLE,
    doc="HyperLogLog distinct-token estimate per source (m=64, portable md5"
        " registers), exact count alongside for the error to be visible",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(T.tokens(F.col("text"))).alias("token"))
    est = SK.hll_estimate(SK.hll_registers(tok, "token", ["source"]), ["source"])
    exact = tok.groupBy("source").agg(
        F.countDistinct("token").alias("exact_distinct")
    )
    # 20 sources: the exact side is broadcast; at scale one would drop it
    # (it exists here precisely to expose the sketch's error).
    return est.join(F.broadcast(exact), "source")


# ---------------------------------------------------------------------------
# CMS heavy hitters: tokens whose count-min estimate clears a threshold.
# CMS estimates >= truth, so the threshold never misses a true heavy
# hitter; exact counts ride along to show the overestimate.
# ---------------------------------------------------------------------------

_CMS_THRESHOLD = 200

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
cells AS (
  SELECT k, CAST(CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || token), 1, 15))
                      AS BIGINT) % {SK.CMS_W} AS INT) AS cell,
         n, token
  FROM counts CROSS JOIN range({SK.CMS_D}) AS r(k)
),
sketch AS (SELECT k, cell, SUM(n) AS cell_n FROM cells GROUP BY k, cell),
est AS (
  SELECT c.token, MIN(s.cell_n) AS cms_n
  FROM cells c JOIN sketch s ON c.k = s.k AND c.cell = s.cell
  GROUP BY c.token
)
SELECT est.token, CAST(counts.n AS BIGINT) AS exact_n, CAST(cms_n AS BIGINT) AS cms_n
FROM est JOIN counts ON est.token = counts.token
WHERE cms_n >= {_CMS_THRESHOLD}
"""


@register(
    "sketch_cms_heavy_hitters",
    oracle=_CMS_ORACLE,
    doc=f"count-min sketch ({SK.CMS_D}x{SK.CMS_W}) heavy hitters at"
        f" threshold {_CMS_THRESHOLD}; exact counts alongside",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    sketch = SK.cms_sketch(counts, "token", "n")  # d*w = 1024 counters
    cells = counts.selectExpr(
        "token", "n", f"explode(sequence(0, {SK.CMS_D - 1})) as k"
    ).selectExpr(
        "token",
        "n",
        "k",
        f"cast(cast(conv(substring(md5(concat(cast(k as string), ':', token)), "
        f"1, 15), 16, 10) as bigint) % {SK.CMS_W} as int) as cell",
    )
    est = (
        cells.join(F.broadcast(sketch), ["k", "cell"])
        .groupBy("token", "n")
        .agg(F.min("cell_n").alias("cms_n"))
    )
    return est.where(F.col("cms_n") >= _CMS_THRESHOLD).select(
        "token", F.col("n").cast("bigint").alias("exact_n"), "cms_n"
    )


# ---------------------------------------------------------------------------
# Bloom-pruned join: a selective orders filter builds a bloom filter that
# prunes the lineitem scan BEFORE the join shuffle. The join still runs,
# so false positives are eliminated and the result equals the plain join —
# which is exactly what the oracle asserts.
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 17  # 131072 bits = 2 KiB of longs; ~3% FP at sf0.01 load
_BLOOM_K = 3
_ORDERS_PRED = "o_orderpriority = '1-URGENT' AND o_totalprice > 250000"

_BLOOM_ORACLE = f"""
SELECT o.o_orderpriority,
       date_trunc('month', CAST(o.o_orderdate AS TIMESTAMP)) AS order_month,
       COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE {_ORDERS_PRED}
GROUP BY 1, 2
"""


@register(
    "j_bloom_pruned",
    oracle=_BLOOM_ORACLE,
    doc="runtime bloom-filter join pruning: selective orders filter -> "
        "bit_or-aggregated bloom words -> broadcast prune of lineitem -> "
        "exact join (FPs eliminated); result provably equals the plain join",
)
def j_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(_ORDERS_PRED)
    lineitem = load_table(spark, sf_dir, "lineitem")
    # Build side: sketch-sized driver materialization (m/64 longs, 16 KiB).
    words = SK.bloom_words(orders, "o_orderkey", _BLOOM_M, _BLOOM_K)
    pruned = SK.with_bloom_prune(
        lineitem, words, "l_orderkey", _BLOOM_M, _BLOOM_K
    )
    joined = pruned.join(orders, pruned.l_orderkey == orders.o_orderkey)
    return joined.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        # DECIMAL accumulation so addition order can't flap the hash
        # (same convention as agg_pricing_summary).
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,10)")), 2)
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Fixed-bin quantile histogram over orders: per-(status, priority) price
# percentiles from a mergeable histogram. Bin = floor(price / 10000);
# rank thresholds are exact integer ceilings, so bins, thresholds and
# upper-edge estimates all hash-match the oracle exactly.
# ---------------------------------------------------------------------------

_QH_BIN = 10000.0
# Upper-edge unit: one 10000-dollar bin = 1_000_000 cents. Edges are
# emitted as BIGINT cents, never doubles — round-7 driver-environment
# hardening: this query went driver hash-red in r6 with rows+schema green
# while its ONLY doubles were integer-valued (bin+1)*10000.0, and it
# passes the strict local DuckDB oracle in every configuration we can
# build, so the remaining exposure was the doubles themselves (however
# the driver environment hashes/format floats). All-integer output
# removes the query from that seam class entirely.
_QH_CENTS = 1_000_000

_QH_ORACLE = f"""
WITH hist AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(floor(CAST(o_totalprice AS DOUBLE) / {_QH_BIN}) AS BIGINT) AS bin,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2, 3
),
cum AS (
  SELECT o_orderstatus, o_orderpriority, bin, n,
         SUM(n) OVER (PARTITION BY o_orderstatus, o_orderpriority
                      ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(n) OVER (PARTITION BY o_orderstatus, o_orderpriority) AS total
  FROM hist
),
agg AS (
  -- CAST: DuckDB's window SUM(BIGINT) widens to HUGEINT (int128), and
  -- the HUGEINT->pandas bridge materializes float64 ("1000.0"), which a
  -- strict value canonicalizer hashes differently from Spark's bigint
  -- "1000" — the root cause of the r5–r7 driver hash-reds (the column
  -- was the ONLY cross-engine dtype-family mismatch in this oracle;
  -- tools/dtype_seam_scan.py now bans the class).
  SELECT o_orderstatus, o_orderpriority,
         CAST(MAX(total) AS BIGINT) AS total,
         MIN(CASE WHEN cum * 2 >= total * 1 THEN bin END) AS p50_bin,
         MIN(CASE WHEN cum * 10 >= total * 9 THEN bin END) AS p90_bin,
         MIN(CASE WHEN cum * 100 >= total * 99 THEN bin END) AS p99_bin
  FROM cum GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority, total, p50_bin, p90_bin, p99_bin,
       CAST((p50_bin + 1) * {_QH_CENTS} AS BIGINT) AS p50_le_cents,
       CAST((p90_bin + 1) * {_QH_CENTS} AS BIGINT) AS p90_le_cents,
       CAST((p99_bin + 1) * {_QH_CENTS} AS BIGINT) AS p99_le_cents
FROM agg
"""


@register(
    "sketch_quantile_hist",
    oracle=_QH_ORACLE,
    doc="mergeable fixed-bin quantile histogram: per-(status, priority)"
        " p50/p90/p99 of order price from map-side-combinable bin counts"
        " — the shuffle carries groups x bins rows, never data; every"
        " output column is BIGINT (bins, counts, cent edges): no double"
        " ever reaches the driver boundary",
)
def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return SK.quantile_hist(
        orders.withColumn(
            "price", F.col("o_totalprice").cast("double")
        ),
        "price",
        ["o_orderstatus", "o_orderpriority"],
        _QH_BIN,
        edge_cents_factor=_QH_CENTS,
    )


# ---------------------------------------------------------------------------
# Quantile-sketch calibration: the histogram estimates next to the EXACT
# per-group percentiles with absolute errors — the companion measurement
# to llm_minhash_calibration for the quantile family. The histogram
# contract bounds (estimate - rank-based percentile) within one
# bin_width. ROUND-7 DRIVER-ENVIRONMENT HARDENING: the exact side no
# longer uses ANY engine percentile function — r5's interpolated
# percentile() and r6's discrete percentile_disc/quantile_disc BOTH went
# driver hash-red while passing every local DuckDB configuration, so the
# element pick is now explicit rank arithmetic that cannot vary by
# engine version: rn = row_number() ordered by integer cents, and the
# type-1 (inverse-CDF) element at q is the row where rn*den >= n*num
# first holds (= rank ceil(q*n)), identical comparisons on both engines.
# All values are BIGINT cents (ROUND(price*100) — the cents convention
# driver-proven green in events_seasonal_forecast and the TPC-H family);
# errors are bigint subtractions. No double reaches the driver boundary.
# The exact side is a per-group sort (the thing the sketch avoids at
# 100 TB) — affordable here precisely because it's the calibration run
# you do once on a sample, not the production path.
# ---------------------------------------------------------------------------

_QCAL_ORACLE = f"""
WITH est AS ({_QH_ORACLE}),
ranked AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY o_orderstatus, o_orderpriority
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey
         ) AS rn,
         COUNT(*) OVER (
           PARTITION BY o_orderstatus, o_orderpriority
         ) AS n
  FROM orders
),
exact AS (
  SELECT o_orderstatus, o_orderpriority,
         MIN(CASE WHEN rn * 2 >= n * 1 THEN cents END) AS p50_exact_cents,
         MIN(CASE WHEN rn * 10 >= n * 9 THEN cents END) AS p90_exact_cents,
         MIN(CASE WHEN rn * 100 >= n * 99 THEN cents END) AS p99_exact_cents
  FROM ranked GROUP BY 1, 2
)
SELECT e.o_orderstatus, e.o_orderpriority, e.total,
       e.p50_le_cents, x.p50_exact_cents,
       e.p50_le_cents - x.p50_exact_cents AS p50_err_cents,
       e.p90_le_cents, x.p90_exact_cents,
       e.p90_le_cents - x.p90_exact_cents AS p90_err_cents,
       e.p99_le_cents, x.p99_exact_cents,
       e.p99_le_cents - x.p99_exact_cents AS p99_err_cents
FROM est e JOIN exact x USING (o_orderstatus, o_orderpriority)
"""


@register(
    "sketch_quantile_calibration",
    oracle=_QCAL_ORACLE,
    doc="histogram-quantile estimates vs exact per-group percentiles"
        " with signed cent errors — measures the bin-width error"
        " contract; exact element picked by explicit rank arithmetic"
        " (no engine percentile function), all-bigint output",
)
def sketch_quantile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    est = sketch_quantile_hist(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    grp = ["o_orderstatus", "o_orderpriority"]
    wp = Window.partitionBy(*grp)
    ranked = (
        orders.select(*grp, cents.alias("cents"), "o_orderkey")
        .withColumn(
            "rn", F.row_number().over(wp.orderBy("cents", "o_orderkey"))
        )
        .withColumn("n", F.count(F.lit(1)).over(wp))
    )
    # Type-1 element at q = value at rank ceil(q*n): cents is
    # nondecreasing in rn, so MIN over {cents : rn*den >= n*num} is the
    # element at the first qualifying rank — pure bigint comparisons.
    exact = ranked.groupBy(*grp).agg(
        F.min(
            F.when(F.col("rn") * 2 >= F.col("n") * 1, F.col("cents"))
        ).alias("p50_exact_cents"),
        F.min(
            F.when(F.col("rn") * 10 >= F.col("n") * 9, F.col("cents"))
        ).alias("p90_exact_cents"),
        F.min(
            F.when(F.col("rn") * 100 >= F.col("n") * 99, F.col("cents"))
        ).alias("p99_exact_cents"),
    )
    j = est.join(exact, grp)
    return j.select(
        *grp,
        "total",
        "p50_le_cents",
        "p50_exact_cents",
        (F.col("p50_le_cents") - F.col("p50_exact_cents")).alias(
            "p50_err_cents"
        ),
        "p90_le_cents",
        "p90_exact_cents",
        (F.col("p90_le_cents") - F.col("p90_exact_cents")).alias(
            "p90_err_cents"
        ),
        "p99_le_cents",
        "p99_exact_cents",
        (F.col("p99_le_cents") - F.col("p99_exact_cents")).alias(
            "p99_err_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Running distinct-users-to-date via HLL register MERGE — the property
# the sketch family exists for: yesterday's 64 registers + today's
# delta = today's cumulative estimate, no history rescan. Spark side
# builds per-day registers once (map-side combinable) and merges by a
# cumulative MAX window over (register j, day order) — |days| x 64 rows
# of window input, never events. The ORACLE recomputes every day's
# registers FROM SCRATCH over the full prefix (day' <= day), so the
# hash equality is a PROOF that incremental merge == recompute — the
# invariant a warehouse relies on when it keeps running sketches
# instead of re-sorting history. Exact running distinct rides along
# (prefix join, test-scale only) to expose the sketch error.
# ---------------------------------------------------------------------------

_RUN_SRC = (
    "(SELECT d.day, e.user_id "
    " FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events) d "
    " JOIN (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events) e "
    "   ON e.day <= d.day) prefix"
)

_HLL_RUNNING_ORACLE = f"""
WITH hll AS ({SK.hll_oracle_sql(_RUN_SRC, "CAST(user_id AS VARCHAR)", ["day"])}),
exact AS (
  SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_distinct
  FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events) d
  JOIN (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events) e
    ON e.day <= d.day
  GROUP BY d.day
)
SELECT hll.day, hll.n_zero_regs, hll.reg_sum, hll.hll_distinct,
       exact.exact_distinct
FROM hll JOIN exact USING (day)
"""


@register(
    "sketch_hll_running_distinct",
    oracle=_HLL_RUNNING_ORACLE,
    doc="running distinct-users-to-date by cumulative HLL register merge"
        " (window over |days| x 64 register rows, never events); oracle"
        " recomputes each prefix from scratch — hash equality proves"
        " merge == recompute",
)
def sketch_hll_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    au = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    regs = SK.hll_registers(au, "cast(user_id as string)", ["day"])
    days = au.select("day").distinct().withColumn(
        "dayno", F.datediff(F.col("day"), F.lit("1970-01-01"))
    )
    js = regs.select("j").distinct()
    grid = days.crossJoin(F.broadcast(js))
    w = (
        Window.partitionBy("j")
        .orderBy("dayno")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        grid.join(regs, ["day", "j"], "left")
        .withColumn("rho_cum", F.max("rho_max").over(w))
        .filter(F.col("rho_cum").isNotNull())
        .select("day", "j", F.col("rho_cum").alias("rho_max"))
    )
    est = SK.hll_estimate(cum, ["day"])
    # exact prefix distinct for error visibility (test scale only — at
    # 100 TB one drops this side; the sketch is the product).
    a = au.select(F.col("day").alias("d2"), "user_id")
    exact = (
        days.join(a, F.col("d2") <= F.col("day"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return est.join(exact, "day")


# ---------------------------------------------------------------------------
# Trailing-7-day distinct users via HLL register merge — the 100 TB twin
# of events_sliding_distinct_users (which is exact over the collapsed
# user-day frame and carries a constant-7x blowup of THAT frame; at
# warehouse scale even the collapsed frame is large). Here raw events
# are touched ONCE to build per-day registers (map-side combinable,
# shuffle carries |days| x 64 rows); the 7-day window is a bounded range
# join of the REGISTER frame against the day dim (<= 7 x 64 rows per
# day) merged by MAX(rho) — the union property the HLL family exists
# for. The oracle recomputes each window's registers from scratch over
# the windowed (day, user) expansion, so hash equality again proves
# merge == recompute, now for arbitrary (not just prefix) windows.
# Exact side rides along for error visibility (test scale only).
# ---------------------------------------------------------------------------

_WIN_SRC = (
    "(SELECT d.day, e.user_id "
    " FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events) d "
    " JOIN (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events) e "
    "   ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day) win"
)

_HLL_SLIDING_ORACLE = f"""
WITH hll AS ({SK.hll_oracle_sql(_WIN_SRC, "CAST(user_id AS VARCHAR)", ["day"])}),
exact AS (
  SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_7d
  FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events) d
  JOIN (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events) e
    ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT hll.day, hll.n_zero_regs, hll.reg_sum, hll.hll_distinct,
       exact.exact_7d
FROM hll JOIN exact USING (day)
"""


@register(
    "sketch_hll_sliding_distinct",
    oracle=_HLL_SLIDING_ORACLE,
    doc="trailing-7-day distinct users by HLL register merge: one pass"
        " over events builds per-day registers; the window is a bounded"
        " range join of |days| x 64 register rows merged by MAX(rho) —"
        " oracle recomputes each window from scratch, hash proves"
        " merge == recompute for sliding windows",
)
def sketch_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    au = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    regs = SK.hll_registers(au, "cast(user_id as string)", ["day"])
    days = au.select("day").distinct()
    win = (
        days.alias("d")
        .join(
            regs.alias("r"),
            (F.col("r.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("r.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.j").alias("j"))
        .agg(F.max("r.rho_max").alias("rho_max"))
    )
    est = SK.hll_estimate(win, ["day"])
    exact = (
        days.alias("d")
        .join(
            au.alias("a"),
            (F.col("a.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("a.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("a.user_id").alias("exact_7d"))
    )
    return est.join(exact, "day")


# ---------------------------------------------------------------------------
# Day-over-day retained-users ESTIMATE by HLL inclusion-exclusion:
# |A ∩ B| ≈ E(A) + E(B) - E(A ∪ B), where all three estimates come from
# the SAME per-day register frame (the union's registers are the
# elementwise MAX — the merge property again). This is the sketch answer
# to "how many of yesterday's users came back today" when the user sets
# are too large to intersect exactly: raw events are touched once; every
# derived frame is |days| x 64 rows. The overlap estimate is integer
# arithmetic over three already-hash-proven BIGINT estimates (it can go
# negative on small sets — HLL noise; emitted signed, documented). The
# exact overlap rides along at test scale to expose the error.
# ---------------------------------------------------------------------------

_RET_AU = (
    "(SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events)"
)
_RET_DAYS = "(SELECT DISTINCT date_trunc('day', ts) AS day FROM events)"
_RET_CUR = (
    f"(SELECT c.day, e.user_id FROM {_RET_DAYS} c"
    f" JOIN {_RET_DAYS} p ON p.day = c.day - INTERVAL 1 DAY"
    f" JOIN {_RET_AU} e ON e.day = c.day) src"
)
_RET_PREV = (
    f"(SELECT c.day, e.user_id FROM {_RET_DAYS} c"
    f" JOIN {_RET_DAYS} p ON p.day = c.day - INTERVAL 1 DAY"
    f" JOIN {_RET_AU} e ON e.day = p.day) src"
)
_RET_UNION = (
    f"(SELECT c.day, e.user_id FROM {_RET_DAYS} c"
    f" JOIN {_RET_DAYS} p ON p.day = c.day - INTERVAL 1 DAY"
    f" JOIN {_RET_AU} e ON e.day = c.day OR e.day = p.day) src"
)

_HLL_RETENTION_ORACLE = f"""
WITH hc AS ({SK.hll_oracle_sql(_RET_CUR, "CAST(user_id AS VARCHAR)", ["day"])}),
hp AS ({SK.hll_oracle_sql(_RET_PREV, "CAST(user_id AS VARCHAR)", ["day"])}),
hu AS ({SK.hll_oracle_sql(_RET_UNION, "CAST(user_id AS VARCHAR)", ["day"])}),
exact AS (
  SELECT b.day, COUNT(DISTINCT a.user_id) AS exact_overlap
  FROM {_RET_AU} a JOIN {_RET_AU} b
    ON a.user_id = b.user_id AND a.day = b.day - INTERVAL 1 DAY
  GROUP BY b.day
)
SELECT hc.day,
       hc.hll_distinct AS est_cur,
       hp.hll_distinct AS est_prev,
       hu.hll_distinct AS est_union,
       hc.hll_distinct + hp.hll_distinct - hu.hll_distinct AS est_overlap,
       COALESCE(exact.exact_overlap, 0) AS exact_overlap
FROM hc JOIN hp USING (day) JOIN hu USING (day)
LEFT JOIN exact USING (day)
"""


@register(
    "sketch_hll_retention",
    oracle=_HLL_RETENTION_ORACLE,
    doc="day-over-day retained users by HLL inclusion-exclusion"
        " (E(A)+E(B)-E(A∪B), union registers = elementwise MAX):"
        " events scanned once, every derived frame |days| x 64 rows;"
        " signed estimate, exact overlap alongside",
)
def sketch_hll_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    au = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    regs = SK.hll_registers(au, "cast(user_id as string)", ["day"])
    days = au.select("day").distinct()
    pairs = (
        days.alias("c")
        .join(
            days.alias("p"),
            F.col("p.day") == F.col("c.day") - F.expr("INTERVAL 1 DAYS"),
        )
        .select(F.col("c.day").alias("day"), F.col("p.day").alias("prev_day"))
    )
    r = regs.select(
        F.col("day").alias("rday"), "j", "rho_max"
    )
    cur = pairs.join(r, F.col("rday") == F.col("day")).select("day", "j", "rho_max")
    prev = pairs.join(r, F.col("rday") == F.col("prev_day")).select(
        "day", "j", "rho_max"
    )
    union_regs = (
        cur.unionByName(prev).groupBy("day", "j").agg(F.max("rho_max").alias("rho_max"))
    )
    ec = SK.hll_estimate(cur, ["day"]).select(
        "day", F.col("hll_distinct").alias("est_cur")
    )
    ep = SK.hll_estimate(prev, ["day"]).select(
        "day", F.col("hll_distinct").alias("est_prev")
    )
    eu = SK.hll_estimate(union_regs, ["day"]).select(
        "day", F.col("hll_distinct").alias("est_union")
    )
    a2 = au.select(
        F.col("day").alias("aday"), F.col("user_id").alias("a_user")
    )
    exact = (
        au.join(
            a2,
            (F.col("a_user") == F.col("user_id"))
            & (F.col("aday") == F.col("day") - F.expr("INTERVAL 1 DAYS")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_overlap"))
    )
    return (
        ec.join(ep, "day")
        .join(eu, "day")
        .join(exact, "day", "left")
        .select(
            "day",
            "est_cur",
            "est_prev",
            "est_union",
            (F.col("est_cur") + F.col("est_prev") - F.col("est_union")).alias(
                "est_overlap"
            ),
            F.coalesce(F.col("exact_overlap"), F.lit(0)).alias("exact_overlap"),
        )
    )


# ---------------------------------------------------------------------------
# KMV source-overlap matrix (round 8): the set-OPERATION sketch HLL
# cannot be. HLL registers only union; a KMV (k-minimum-values /
# theta-sketch core) summary — the k smallest md5 hashes of each
# source's distinct 3-gram shingle set — supports pairwise UNION and
# INTERSECTION estimates, which is how a warehouse answers "how much
# distinct content do sources share?" across a 100 TB corpus without
# an exact distinct self-join. Scale shape: the ONLY corpus-sized work
# is one scan with a map-side hash-threshold filter (survivors are a
# fixed fraction of the distinct space — 1/8 here, ~2^-14 at corpus
# scale); the bottom-k window and all 190 pairwise set operations run
# over |sources| arrays of 64 longs. Estimators: union ~=
# (kk-1)*2^60/kth (bottom-k), intersection ~= union * |common in the
# merged bottom-kk| / kk. Exact distinct overlap rides along at test
# scale (a C(20,2) hash self-join — the thing the sketch replaces) so
# the estimate error is visible in the row. DETERMINISM: md5-derived
# integers throughout; both estimates are floor()ed single IEEE
# divisions of exactly-representable operands — all output columns are
# BIGINT or strings (dtype_seam_scan-clean: COUNT stays BIGINT, and the
# one +/- over counts never widens).
# ---------------------------------------------------------------------------

_KMV_SRC_SHINGLES = rf"""
base AS (SELECT source, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT DISTINCT source,
         CAST(CAST(('0x' || substr(md5(shingle), 1, 15)) AS UBIGINT) AS BIGINT) AS h
  FROM (
    SELECT source,
           unnest(CASE WHEN len(toks) - 2 >= 1
                       THEN list_transform(generate_series(1, len(toks) - 2),
                                           i -> array_to_string(toks[i:i+2], ' '))
                       ELSE [array_to_string(toks, ' ')]
                  END) AS shingle
    FROM base) t
)"""

_KMV_ORACLE = f"""
WITH {_KMV_SRC_SHINGLES},
kmvh AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM sh WHERE h < {SK.KMV_THRESHOLD}
),
km AS (
  SELECT source, list_sort(list(h)) AS kmv
  FROM kmvh WHERE rn <= {SK.KMV_K} GROUP BY source
),
cnt AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
ex AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS exact_inter
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT ka.source AS source_a, kb.source AS source_b,
         ka.kmv AS ka, kb.kmv AS kb
  FROM km ka JOIN km kb ON ka.source < kb.source
),
merged AS (
  SELECT source_a, source_b, ka, kb,
         list_sort(list_distinct(list_concat(ka, kb))) AS m
  FROM pairs
),
sized AS (
  SELECT source_a, source_b, ka, kb, m,
         CAST(LEAST({SK.KMV_K}, len(m)) AS BIGINT) AS kk
  FROM merged
),
est AS (
  SELECT source_a, source_b, kk,
         CAST(len(list_filter(m[1:CAST(kk AS INT)],
                              x -> list_contains(ka, x) AND list_contains(kb, x)))
              AS BIGINT) AS kmv_common,
         CAST(floor((CAST(kk - 1 AS DOUBLE) * 1152921504606846976.0)
                    / CAST(m[CAST(kk AS INT)] AS DOUBLE)) AS BIGINT) AS union_est
  FROM sized
)
SELECT e.source_a, e.source_b, e.kk, e.kmv_common, e.union_est,
       CAST(floor(CAST(e.kmv_common AS DOUBLE) * CAST(e.union_est AS DOUBLE)
                  / CAST(e.kk AS DOUBLE)) AS BIGINT) AS inter_est,
       e.kmv_common * 1000 // e.kk AS jacc_est_permille,
       na.n + nb.n - COALESCE(x.exact_inter, 0) AS exact_union,
       COALESCE(x.exact_inter, 0) AS exact_inter,
       COALESCE(x.exact_inter, 0) * 1000
         // (na.n + nb.n - COALESCE(x.exact_inter, 0)) AS exact_jacc_permille
FROM est e
JOIN cnt na ON na.source = e.source_a
JOIN cnt nb ON nb.source = e.source_b
LEFT JOIN ex x ON x.source_a = e.source_a AND x.source_b = e.source_b
"""


@register(
    "sketch_kmv_source_overlap",
    oracle=_KMV_ORACLE,
    doc=f"KMV (bottom-{SK.KMV_K} / theta) distinct-overlap matrix between"
        " sources over 3-gram shingles: pairwise union/intersection/"
        "Jaccard estimates from 64-hash summaries — the set-operation"
        " sketch HLL lacks; exact overlap rides along at test scale",
)
def sketch_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.llm.text_analysis import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source",
            F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias(
                "shingle"
            ),
        )
        .select(
            "source",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
        # One tokenize+hash pass total: the KMV build, the per-source
        # exact counts and the exact pair join all read this frame.
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("source").orderBy("h")
    km = (
        sh.where(F.col("h") < SK.KMV_THRESHOLD)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SK.KMV_K)
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )
    cnt = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "h")
    b = sh.select(F.col("source").alias("source_b"), "h")
    ex = (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    ka = km.select(F.col("source").alias("source_a"), F.col("kmv").alias("ka"))
    kb = km.select(F.col("source").alias("source_b"), F.col("kmv").alias("kb"))
    # |sources|^2 bounded pair frame: both sides are sketch-sized.
    pairs = (
        ka.crossJoin(kb)
        .where(F.col("source_a") < F.col("source_b"))
        .withColumn("m", F.array_sort(F.array_union("ka", "kb")))
        .withColumn(
            "kk", F.least(F.lit(SK.KMV_K), F.size("m")).cast("bigint")
        )
        .withColumn("kth", F.expr("element_at(m, cast(kk as int))"))
        .withColumn(
            "kmv_common",
            F.expr(
                "cast(size(filter(slice(m, 1, cast(kk as int)),"
                " x -> array_contains(ka, x) AND array_contains(kb, x)))"
                " as bigint)"
            ),
        )
        .withColumn(
            "union_est",
            F.floor(
                ((F.col("kk") - 1).cast("double") * F.lit(float(SK.KMV_SPACE)))
                / F.col("kth").cast("double")
            ).cast("bigint"),
        )
    )
    na = cnt.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    nb = cnt.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .join(F.broadcast(ex), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "kk",
            "kmv_common",
            "union_est",
            F.floor(
                F.col("kmv_common").cast("double")
                * F.col("union_est").cast("double")
                / F.col("kk").cast("double")
            )
            .cast("bigint")
            .alias("inter_est"),
            F.expr("kmv_common * 1000 div kk").alias("jacc_est_permille"),
            (
                F.col("n_a") + F.col("n_b")
                - F.coalesce(F.col("exact_inter"), F.lit(0))
            ).alias("exact_union"),
            F.coalesce(F.col("exact_inter"), F.lit(0)).alias("exact_inter"),
            F.expr(
                "coalesce(exact_inter, 0) * 1000"
                " div (n_a + n_b - coalesce(exact_inter, 0))"
            ).alias("exact_jacc_permille"),
        )
    )
