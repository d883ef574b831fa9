"""Event-stream-shaped batch queries over the events table.

The reference is batch-only (SURVEY §2.8) — these queries cover the
streaming-*shaped* behaviors (event-time windows, sessionization) in batch
where DuckDB can oracle them; the live Structured Streaming versions of
the same transformations live in sig_etl_spark/streaming/ and are tested
with availableNow triggers (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register(
    "events_hourly_rollup",
    oracle=_HOURLY_ORACLE,
    doc="tumbling 1h event-time window counts + decimal-stable value sums",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


_SESSION_ORACLE = """
WITH o AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS is_new
  FROM o
),
c AS (
  -- CAST: DuckDB windowed SUM(int) is HUGEINT-wide; Spark's is BIGINT.
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM s
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       -- CAST pins microsecond TIMESTAMP (DuckDB may carry TIMESTAMP_NS here).
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end
FROM c GROUP BY 1, 2
"""


@register(
    "events_sessionize",
    oracle=_SESSION_ORACLE,
    doc="gap-based sessionization (30 min) via lag + running sum windows",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(order))
    is_new = F.when(
        F.lag("ts").over(order).isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(running))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent click at or
# before it, within a 1-hour tolerance. Spark has no ASOF JOIN builtin —
# temporal.asof_join realizes it as union-tag + fill-forward window (one
# shuffle, no range explosion); DuckDB's native ASOF LEFT JOIN is the
# oracle. Clicks are deduplicated per (user, ts) first (max event_id) so
# tie-handling is engine-independent.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
),
c0 AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         MAX(struct_pack(event_id := event_id, value := value)) AS s
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, CAST(ts AS TIMESTAMP)
),
c AS (SELECT user_id, ts, s.event_id AS event_id, s.value AS value FROM c0)
SELECT p.user_id, p.event_id, p.ts, p.value,
       CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.event_id END AS click_id,
       CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.ts END AS click_ts,
       CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.value END AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register(
    "events_asof_purchase_click",
    oracle=_ASOF_ORACLE,
    doc="as-of join (backward, 1h tolerance): purchases to the latest"
        " prior click per user; union-tag + fill-forward window plan",
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("s"))
        .select("user_id", "ts", F.col("s.event_id").alias("cid"),
                F.col("s.value").alias("cval"))
    )
    joined = asof_join(
        purchases, clicks, on="ts", by=["user_id"], tolerance_s=3600.0
    )
    return joined.select(
        "user_id", "event_id", "ts", "value",
        F.col("cid_r").alias("click_id"),
        F.col("ts_r").alias("click_ts"),
        F.col("cval_r").alias("click_value"),
    )


# ---------------------------------------------------------------------------
# Range join: views falling inside a +-30-minute window around an error of
# the same user (incident correlation). temporal.range_join buckets both
# sides onto the time grid so the pairing is an equi-join + residual
# filter; the oracle is the plain inequality join DuckDB can afford at
# sf0.01.
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
WITH v AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'view'
),
e AS (
  SELECT user_id, event_id AS err_id,
         CAST(ts AS TIMESTAMP) - INTERVAL 30 MINUTE AS w_start,
         CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT v.user_id, v.event_id, v.ts, e.err_id, e.w_start, e.w_end
FROM v JOIN e ON v.user_id = e.user_id
              AND e.w_start <= v.ts AND v.ts <= e.w_end
"""


@register(
    "events_range_join",
    oracle=_RANGE_ORACLE,
    doc="bucketized interval join: views inside +-30min error windows per"
        " user; equi-join on (user, time bucket) + residual filter",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.temporal import range_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    joined = range_join(
        views, errors, left_ts="ts", right_start="w_start",
        right_end="w_end", by=["user_id"], bucket_s=1800,
    )
    return joined.select(
        "user_id", "event_id", "ts",
        F.col("err_id_r").alias("err_id"),
        F.col("w_start_r").alias("w_start"),
        F.col("w_end_r").alias("w_end"),
    )


# ---------------------------------------------------------------------------
# Multi-resolution rollup (hypertable-style continuous-aggregate shape):
# day x event_type with ROLLUP subtotals and a grouping id, the coarse
# tiers reaggregated from the same scan. Decimal-stable sums keep the
# value hash partition-count-independent.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       GROUPING(date_trunc('day', ts), event_type) AS gid,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), event_type)
"""


@register(
    "events_rollup_sets",
    oracle=_ROLLUP_ORACLE,
    doc="ROLLUP grouping sets: day x type, per-day subtotal, grand total"
        " with grouping_id",
)
def events_rollup_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return (
        ev.rollup(day, F.col("event_type"))
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Exact quantiles per event type: DISCRETE (type-1 inverse-CDF)
# percentiles — percentile_disc / quantile_disc return an actual data
# element, bit-identical across engines because both pick the same rank
# from the same parquet doubles (round-6 seam-proofing: interpolated
# quantile_cont midpoint arithmetic is a cross-engine ulp seam, the r05
# driver hash-red root cause in the sibling sketch family — the repo's
# float-seam lint now bans it outright).
# ---------------------------------------------------------------------------

_QUANTILE_ORACLE = """
SELECT event_type,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.95) AS p95,
       MIN(value) AS vmin, MAX(value) AS vmax
FROM events GROUP BY event_type
"""


@register(
    "events_quantiles",
    oracle=_QUANTILE_ORACLE,
    doc="exact discrete p50/p95 per event type (sort-based, not approx;"
        " type-1 inverse-CDF so the emitted value is an actual element)",
)
def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


# ---------------------------------------------------------------------------
# Conversion funnel: per user, the first signup, the first click at or
# after it, and the first purchase at or after that — the ordered-stage
# analysis a behavioral pipeline runs. One hash shuffle on user_id; the
# three stage timestamps are windowed conditional mins over the same
# partition (no joins, no re-shuffles), then one row per user.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
t1 AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS click_ts
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= t1.signup_ts
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS purchase_ts
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= t2.click_ts
  GROUP BY e.user_id
)
SELECT u.user_id, t1.signup_ts, t2.click_ts, t3.purchase_ts
FROM u
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
"""


@register(
    "events_funnel",
    oracle=_FUNNEL_ORACLE,
    doc="signup->click->purchase funnel: ordered conditional stage mins,"
        " one shuffle on user_id",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    byu = Window.partitionBy("user_id")
    signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(byu)
    e1 = ev.select("user_id", "ts", "event_type", signup.alias("signup_ts"))
    click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("signup_ts")),
            F.col("ts"),
        )
    ).over(byu)
    e2 = e1.select("user_id", "ts", "event_type", "signup_ts", click.alias("click_ts"))
    purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("click_ts")),
            F.col("ts"),
        )
    ).over(byu)
    e3 = e2.select("user_id", "signup_ts", "click_ts", purchase.alias("purchase_ts"))
    return e3.groupBy("user_id").agg(
        F.first("signup_ts").alias("signup_ts"),
        F.first("click_ts").alias("click_ts"),
        F.first("purchase_ts").alias("purchase_ts"),
    )


# ---------------------------------------------------------------------------
# Pivot: daily event counts, one column per event type — the wide
# reporting shape. Spark's pivot with an explicit value list stays a
# single groupBy (no second pass to discover columns); the oracle is the
# equivalent conditional aggregation.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       {", ".join(
           f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
           for t in _EVENT_TYPES
       )}
FROM events GROUP BY 1
"""


@register(
    "events_pivot",
    oracle=_PIVOT_ORACLE,
    doc="pivot: daily counts, one column per event type (explicit value"
        " list keeps it single-pass)",
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# Schema-on-read JSON extraction: events.props is a JSON string column
# (the universal "loose properties" bag of event pipelines). The path
# expression stays JVM-side (get_json_object — no Python, no
# whole-column from_json materialization when one field is needed), the
# extracted value feeds a normal aggregate. Per-type sum/min/max of k
# plus a null-tally proves both extraction and the cast contract.
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
WITH x AS (
  -- integer-regex gate before the cast: a bare CAST diverges across
  -- engines on non-integer payloads (DuckDB rounds '12.5' to 13, ANSI
  -- Spark throws) — gated, both yield NULL and count as missing.
  SELECT event_type,
         CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(COUNT(*) - COUNT(k) AS BIGINT) AS n_missing
FROM x GROUP BY event_type
"""


@register(
    "events_json_extract",
    oracle=_JSON_ORACLE,
    doc="schema-on-read JSON: get_json_object path extraction from the"
        " props bag, aggregated per event type — JVM-side, single pass",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ks = F.get_json_object(F.col("props"), "$.k")
    # integer-regex gate (mirrors the oracle): never a bare ANSI cast on
    # schema-on-read data — a '12.5' payload would crash the query where
    # the oracle's cast rounds; gated, both sides agree it is missing.
    k = F.when(ks.rlike(r"^-?[0-9]+$"), ks.cast("bigint"))
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        (F.count(F.lit(1)) - F.count(k)).alias("n_missing"),
    )


# ---------------------------------------------------------------------------
# Cohort retention — the canonical activity matrix: users grouped by
# first-seen day, counted on each later active day as a day offset.
# Scale shape: one distinct over (user, day) and one min-per-user, both
# map-side-combinable on the user hash; the cohort join is user-keyed
# (co-partitioned with the activity shuffle, AQE-coalesced) — nothing
# broadcasts a user-sized frame, nothing explodes.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT c.cohort_day,
       CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


@register(
    "events_retention",
    oracle=_RETENTION_ORACLE,
    doc="cohort retention matrix: first-seen-day cohorts x day offset,"
        " distinct active users — user-keyed shuffles only",
)
def events_retention(
    spark: SparkSession, sf_dir: str, max_days: int | None = None
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # day as a midnight timestamp (not DATE): both engines and the hash
    # canonicalization agree on timestamp rendering, and the other events
    # queries share the convention.
    #
    # Single-pass shape: ONE user-keyed shuffle builds each user's
    # distinct-day set (collect_set dedupes map-side), the cohort day is
    # array_min of that set (no join back), and after explode every
    # (cohort, offset, user) row is unique BY CONSTRUCTION — so count(*)
    # replaces countDistinct(user), removing the distinct-expansion
    # exchange. 2 shuffles total vs 4 + a user-sized join for the naive
    # activity⋈cohort plan; the per-user set is bounded by the calendar,
    # not by event volume.
    # GUARD: the per-user set holds one entry per distinct ACTIVE DAY, so
    # it is bounded by the calendar span of the data (a decade of daily
    # activity is ~3.7k timestamps/user, a few tens of KB) — never by
    # event volume. For pipelines ingesting longer horizons, max_days
    # caps each user at their first max_days active days (sorted slice),
    # bounding the downstream explode while keeping the cohort day —
    # the default (None) leaves the oracle-checked semantics untouched.
    per_user = (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    if max_days is not None:
        per_user = per_user.withColumn(
            "days", F.slice(F.array_sort("days"), 1, max_days)
        )
    exploded = per_user.select(
        F.array_min("days").alias("cohort_day"), F.explode("days").alias("day")
    )
    return exploded.groupBy(
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Daily anomaly z-scores per event type: two exact integer/decimal passes
# (per-day decimal sums, then per-type moments over the daily series),
# sqrt only at the end so both engines compute the identical double.
# The shape is the standard monitoring rollup: tiny after the first
# aggregation, so the second pass is effectively free at any scale.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 6) AS DOUBLE) AS day_total
  FROM events GROUP BY 1, 2
),
stats AS (
  -- sum_sq: square in DOUBLE (identical inputs -> identical IEEE product
  -- on both engines), THEN cast to decimal for the order-independent
  -- sum. A decimal*decimal product would type differently per engine
  -- (Spark truncates the scale to 6 under precision-loss rules, DuckDB
  -- keeps scale 20) and silently round only one side.
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(ROUND(SUM(CAST(day_total AS DECIMAL(38,10))), 6) AS DOUBLE) AS sum_total,
         CAST(ROUND(SUM(CAST(day_total * day_total AS DECIMAL(38,10))), 6) AS DOUBLE) AS sum_sq
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.day_total,
       ROUND((d.day_total - s.sum_total / s.n_days)
             / sqrt(GREATEST(s.sum_sq / s.n_days
                             - (s.sum_total / s.n_days) * (s.sum_total / s.n_days),
                             1e-12)), 6) AS zscore
FROM daily d JOIN stats s USING (event_type)
"""


@register(
    "events_zscore",
    oracle=_ZSCORE_ORACLE,
    doc="daily anomaly z-scores per event type: decimal-exact two-pass"
        " moments, sqrt deferred to the final double",
)
def events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(38,10)")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.sum(dec), 6).cast("double").alias("day_total"))
    ddec = F.col("day_total").cast("decimal(38,10)")
    # square in DOUBLE then cast the product (see the oracle comment):
    # decimal*decimal would silently truncate to scale 6 on the Spark
    # side only (allowPrecisionLoss) while DuckDB keeps scale 20.
    dsq = (F.col("day_total") * F.col("day_total")).cast("decimal(38,10)")
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum(ddec), 6).cast("double").alias("sum_total"),
        F.round(F.sum(dsq), 6).cast("double").alias("sum_sq"),
    )
    mean = F.col("sum_total") / F.col("n_days")
    var = F.col("sum_sq") / F.col("n_days") - mean * mean
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "day_total",
        F.round(
            (F.col("day_total") - mean) / F.sqrt(F.greatest(var, F.lit(1e-12))), 6
        ).alias("zscore"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands / SCD2 interval build: collapse each user's event stream
# into maximal runs of consecutive identical event_type, with validity
# intervals — the standard change-log -> slowly-changing-dimension shape
# (type-2 history table). One user-keyed shuffle; the lag, running sum and
# lead all reuse the same (user_id) partitioning, and the island groupBy is
# map-side combinable within it.
# ---------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH o AS (
  SELECT event_id, user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
c AS (
  -- CAST: DuckDB windowed SUM(int) is HUGEINT-wide; Spark's is BIGINT.
  SELECT *, CAST(SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                          THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM o
),
runs AS (
  SELECT user_id, island, MIN(event_type) AS event_type,
         CAST(MIN(ts) AS TIMESTAMP) AS valid_from,
         CAST(MAX(ts) AS TIMESTAMP) AS valid_to,
         COUNT(*) AS n_events
  FROM c GROUP BY user_id, island
)
SELECT user_id, island, event_type, valid_from, valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
         AS next_valid_from,
       n_events
FROM runs
"""


@register(
    "events_gaps_islands",
    oracle=_ISLANDS_ORACLE,
    doc="gaps-and-islands: collapse per-user event runs into SCD2-style"
        " validity intervals (valid_from/valid_to/next_valid_from)",
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    c = ev.withColumn(
        "island",
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    runs = c.groupBy("user_id", "island").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("island")
    return runs.select(
        "user_id",
        "island",
        "event_type",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(wl).alias("next_valid_from"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance: the warehouse upsert pattern. The
# "state" is the daily rollup over closed days; the "increment"
# recomputes an overlapping tail window (late/duplicate delivery safe).
# Merge = full-outer join, increment wins on overlap — and the ORACLE is
# the plain one-shot rollup, so the hash check proves the staged
# maintenance path converges to the same table as a full recompute.
# ---------------------------------------------------------------------------

_INC_ORACLE = """
SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register(
    "events_incremental_merge",
    oracle=_INC_ORACLE,
    doc="incremental rollup upsert: state (days < cutoff) full-outer-"
        "merged with a re-read 3-day tail increment, increment winning"
        " on overlap — oracle is the one-shot rollup, so the hash proves"
        " idempotent convergence",
)
def events_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        F.col("value").cast("decimal(38,10)").alias("v"),
    )
    # cutoff = max(day) - 2, derived declaratively and broadcast; the
    # increment re-reads one already-closed day (cutoff - 1) on purpose:
    # replay must not double-count.
    bounds = ev.groupBy().agg(F.date_sub(F.max("day"), 2).alias("cut"))
    tagged = ev.crossJoin(F.broadcast(bounds))

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 2).cast("double").alias("sum_value"),
        )

    state = rollup(tagged.filter(F.col("day") < F.col("cut")))
    inc = rollup(tagged.filter(F.col("day") >= F.date_sub(F.col("cut"), 1)))
    s = state.select(
        "day", "event_type",
        F.col("n").alias("n_s"), F.col("sum_value").alias("sum_s"),
    )
    i = inc.select(
        "day", "event_type",
        F.col("n").alias("n_i"), F.col("sum_value").alias("sum_i"),
    )
    return s.join(i, ["day", "event_type"], "full_outer").select(
        "day",
        "event_type",
        F.coalesce("n_i", "n_s").alias("n"),
        F.coalesce("sum_i", "sum_s").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over the event stream: for every ordered pair
# (event_type -> next event_type within the same user), the transition
# count and probability. The per-user lead() and the pair groupBy reuse
# ONE hash shuffle shape (user_id, then pair); at 100 TB the state is
# |event_type|^2 rows — trivially collectable — while the heavy stage is
# a single windowed pass over the raw stream. Probability is emitted as
# BIGINT/BIGINT double division (a single IEEE-754 op, so bit-identical
# between Spark and the DuckDB oracle — no rounding fudge needed).
# Covers the reference's sequential-dependency analyses (session-grouped
# scans, SURVEY §2.1 S11) as a first-class statistical operator.
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH nxt AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
pairs AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM nxt WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, next_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
         AS p
FROM pairs
"""


@register(
    "events_transition_matrix",
    oracle=_TRANSITION_ORACLE,
    doc="Markov event-type transition counts + probabilities: one "
        "user-keyed windowed pass, then a pair groupBy over "
        "|types|^2-bounded state",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(order))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_from = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(per_from).cast("double")).alias("p"),
    )


# ---------------------------------------------------------------------------
# Top session-opening paths: each user's first 5 events (by event time)
# joined into a '>'-delimited path string, then the 20 most common paths.
# The per-user prefix cap (rank <= 5) bounds the path aggregation state at
# 5 rows/user regardless of how long a user's history is — the property
# that keeps the collect_list from becoming the unbounded-array OOM at
# 100 TB. Two shuffles total (user window -> path groupBy); the final
# top-20 is a TakeOrdered, not a global sort. Tie-break on the path
# string keeps the limit deterministic for the oracle hash.
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 5 GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM paths GROUP BY path
ORDER BY n_users DESC, path
LIMIT 20
"""


@register(
    "events_session_paths",
    oracle=_PATHS_ORACLE,
    doc="top-20 first-5-event user paths: per-user prefix cap bounds "
        "aggregation state, TakeOrdered final",
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(order)).filter(F.col("rn") <= 5)
    paths = (
        ranked.groupBy("user_id")
        .agg(
            F.array_join(
                # sort_array on (rn, event_type) structs pins in-path order
                # without relying on collect_list's arrival order.
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Trailing 3-day sliding average per event type — the RANGE-frame window
# (value-based frame, not row-count), which none of the other window
# queries exercise. Scale shape: the raw stream is first collapsed to
# per-(type, day) partial aggregates (map-side combinable; the window
# then runs over |types| x |days| rows, not events), and the range frame
# is keyed on integer epoch-day so both engines bound the frame with
# exact integer comparisons. Decimal day-sums make the 3-day numerator
# exact; the average is one double division.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
           AS dayno,
         COUNT(*) AS n_day,
         SUM(CAST(value AS DECIMAL(38,10))) AS v_day
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, day, n_day,
       CAST(SUM(n_day) OVER w AS BIGINT) AS n_3d,
       CAST(SUM(v_day) OVER w AS DOUBLE)
         / CAST(CAST(SUM(n_day) OVER w AS BIGINT) AS DOUBLE) AS avg_3d
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY dayno
             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@register(
    "events_sliding_window_avg",
    oracle=_SLIDING_ORACLE,
    doc="trailing 3-day RANGE-frame average per event type over "
        "pre-collapsed daily partials — window input is |types|x|days|, "
        "never raw events",
)
def events_sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("value").cast("decimal(38,10)").alias("v"),
        )
        .withColumn("dayno", F.datediff(F.col("day"), F.lit("1970-01-01")))
        .groupBy("event_type", "day", "dayno")
        .agg(F.count(F.lit(1)).alias("n_day"), F.sum("v").alias("v_day"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dayno")
        .rangeBetween(-2, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n_day",
        F.sum("n_day").over(w).alias("n_3d"),
        (
            F.sum("v_day").over(w).cast("double")
            / F.sum("n_day").over(w).cast("double")
        ).alias("avg_3d"),
    )


# ---------------------------------------------------------------------------
# Robust anomaly gate: per event type, the median, the MAD (median
# absolute deviation — the robust sigma), and how many points sit
# outside median +- 3 * 1.4826 * MAD. Two grouped exact-percentile
# passes (DISCRETE type-1 medians, same seam-proof rule as
# events_quantiles — an actual data element, never interpolated) with a
# broadcast of the |types|-row center table between them — the raw
# stream is scanned twice but never joined to itself. The z-threshold
# comparison is pure IEEE arithmetic on identical inputs.
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, ANY_VALUE(med) AS med, quantile_disc(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, m.med, m.mad,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN ABS(d.value - m.med) > 3 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY 1, 2, 3
"""


@register(
    "events_anomaly_mad",
    oracle=_MAD_ORACLE,
    doc="median/MAD robust outlier counts per event type: two exact-"
        "percentile passes with a broadcast |types|-row center table",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad"),
    )
    out = dev.select("event_type", "value").join(F.broadcast(mad), "event_type")
    thresh = F.lit(3) * F.lit(1.4826) * F.col("mad")
    return out.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.abs(F.col("value") - F.col("med")) > thresh, 1).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Trailing 7-day distinct users per day — the windowed COUNT(DISTINCT)
# that plain window frames cannot express (distinct doesn't compose
# across frame rows). Exact strategy: collapse to distinct (user, day)
# pairs first (map-side combinable; at most one row per user-day), then
# a bounded range join against the |days| dimension — each active-day
# row lands in at most 7 output days, so the blowup is a constant 7x on
# the already-collapsed frame, never on raw events. The per-day distinct
# re-count after the join is exact because a user contributes at most
# one row per (day, window-day). At 100 TB the HLL-register variant
# (sketches.py) replaces the exact re-count when approximate is
# acceptable; this operator is the exact baseline.
# ---------------------------------------------------------------------------

_SLIDING_DISTINCT_ORACLE = """
WITH au AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM au)
SELECT d.day, COUNT(DISTINCT a.user_id) AS active_7d
FROM days d
JOIN au a ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
"""


@register(
    "events_sliding_distinct_users",
    oracle=_SLIDING_DISTINCT_ORACLE,
    doc="exact trailing-7-day distinct users: distinct (user, day)"
        " collapse, then a constant-7x bounded range join — never a"
        " distinct over raw events per window",
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    au = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    days = au.select("day").distinct()
    joined = days.alias("d").join(
        au.alias("a"),
        (F.col("a.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS"))
        & (F.col("a.day") <= F.col("d.day")),
    )
    return joined.groupBy(F.col("d.day").alias("day")).agg(
        F.countDistinct("a.user_id").alias("active_7d")
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness: daily actives over trailing-7-day actives — the
# engagement ratio product teams track. Reuses the bounded range-join
# shape of events_sliding_distinct_users for the WAU side and a plain
# per-day distinct for the DAU side; the ratio is one division of two
# exact BIGINTs. At 100 TB both sides run over the collapsed distinct
# (user, day) frame, never raw events.
# ---------------------------------------------------------------------------

_STICKINESS_ORACLE = """
WITH au AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
dau AS (SELECT day, COUNT(*) AS dau FROM au GROUP BY day),
days AS (SELECT DISTINCT day FROM au),
wau AS (
  SELECT d.day, COUNT(DISTINCT a.user_id) AS wau
  FROM days d JOIN au a ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT dau.day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau USING (day)
"""


@register(
    "events_dau_stickiness",
    oracle=_STICKINESS_ORACLE,
    doc="DAU/WAU engagement ratio per day: both sides over the collapsed"
        " distinct (user, day) frame, bounded 7x range join for WAU",
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    au = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    dau = au.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = au.select("day").distinct()
    wau = (
        days.alias("d")
        .join(
            au.alias("a"),
            (F.col("a.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("a.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("a.user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Funnel drop-off summary: the 3-row stage report derived from the
# oracle-green per-user funnel — users reaching each stage, absolute
# conversion from stage 1, and step conversion from the previous stage.
# The per-user frame collapses to three counted booleans in ONE
# aggregate (no re-scan per stage); ratios are exact-integer divisions.
# ---------------------------------------------------------------------------

_DROPOFF_ORACLE = f"""
WITH f AS ({_FUNNEL_ORACLE}),
agg AS (
  SELECT CAST(SUM(CASE WHEN signup_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s3
  FROM f
)
SELECT stage, n_users, conv_from_start, conv_from_prev
FROM (
  SELECT 'signup' AS stage, s1 AS n_users, 1.0 AS conv_from_start,
         1.0 AS conv_from_prev, 1 AS ord FROM agg
  UNION ALL
  SELECT 'click', s2, CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE),
         CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE), 2 FROM agg
  UNION ALL
  SELECT 'purchase', s3, CAST(s3 AS DOUBLE) / CAST(s1 AS DOUBLE),
         CAST(s3 AS DOUBLE) / CAST(s2 AS DOUBLE), 3 FROM agg
) t
"""


@register(
    "events_funnel_dropoff",
    oracle=_DROPOFF_ORACLE,
    doc="3-row funnel stage report: one aggregate over the per-user"
        " funnel frame, exact-integer conversion ratios",
)
def events_funnel_dropoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = events_funnel(spark, sf_dir)
    agg = f.groupBy().agg(
        F.sum(F.col("signup_ts").isNotNull().cast("int")).cast("bigint").alias("s1"),
        F.sum(F.col("click_ts").isNotNull().cast("int")).cast("bigint").alias("s2"),
        F.sum(F.col("purchase_ts").isNotNull().cast("int")).cast("bigint").alias("s3"),
    )
    s1, s2, s3 = F.col("s1"), F.col("s2"), F.col("s3")
    rows = [
        agg.select(
            F.lit("signup").alias("stage"),
            s1.alias("n_users"),
            F.lit(1.0).alias("conv_from_start"),
            F.lit(1.0).alias("conv_from_prev"),
        ),
        agg.select(
            F.lit("click").alias("stage"),
            s2.alias("n_users"),
            (s2.cast("double") / s1.cast("double")).alias("conv_from_start"),
            (s2.cast("double") / s1.cast("double")).alias("conv_from_prev"),
        ),
        agg.select(
            F.lit("purchase").alias("stage"),
            s3.alias("n_users"),
            (s3.cast("double") / s1.cast("double")).alias("conv_from_start"),
            (s3.cast("double") / s2.cast("double")).alias("conv_from_prev"),
        ),
    ]
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# Inter-event-time distribution: per event type, a log2-bucketed
# histogram of the gaps between consecutive events of the SAME USER —
# the burstiness profile behind rate limiting and bot detection.
# DETERMINISM TRICK: the bucket is the BIT LENGTH of the microsecond
# gap, computed as length(bin(gap)) on both engines (the same exact-
# integer log2 the HLL rho uses) — no floating log anywhere. One
# user-keyed window pass, then a (type, bucket) combinable groupBy.
# ---------------------------------------------------------------------------

_GAP_ORACLE = """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap_us
  FROM events
),
b AS (
  SELECT event_type,
         CASE WHEN gap_us <= 0 THEN 0 ELSE length(bin(gap_us)) END AS bucket
  FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type, CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n
FROM b GROUP BY event_type, bucket
"""


@register(
    "events_gap_distribution",
    oracle=_GAP_ORACLE,
    doc="log2-bucketed inter-event gap histogram per type via exact"
        " integer bit length (length(bin(gap))) — no floating log;"
        " one user window + one combinable groupBy",
)
def events_gap_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    bucket = F.when(F.col("gap_us") <= 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("gap_us")))
    )
    return (
        g.select("event_type", bucket.cast("int").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Naive seasonal forecast + error report (round 6): forecast each
# (event_type, day)'s total value as the SAME WEEKDAY LAST WEEK's
# total — the baseline every forecasting pipeline must beat, and the
# shape of its evaluation harness (per-series absolute errors). Scale
# shape: one combinable groupBy to the (type, day) frame (integer
# cents), then a CALENDAR join on day-7 (an equi-join on the derived
# dayno, correct across gaps — a lag(7) row window would silently
# misalign when days are missing). All errors integer cents.
# ---------------------------------------------------------------------------

_FORECAST_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dayno,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS actual_cents
  FROM events GROUP BY 1, 2, 3
)
SELECT a.event_type, a.day, a.actual_cents,
       f.actual_cents AS forecast_cents,
       ABS(a.actual_cents - f.actual_cents) AS abs_err_cents
FROM daily a
JOIN daily f ON f.event_type = a.event_type AND f.dayno = a.dayno - 7
"""


@register(
    "events_seasonal_forecast",
    oracle=_FORECAST_ORACLE,
    doc="naive same-weekday-last-week forecast with per-series integer"
        " absolute errors: combinable daily rollup + calendar dayno-7"
        " equi-join (gap-correct, unlike a row-offset lag)",
)
def events_seasonal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("actual_cents")
        )
        .withColumn(
            "dayno", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint")
        )
    )
    f = daily.select(
        F.col("event_type").alias("f_type"),
        F.col("dayno").alias("f_dayno"),
        F.col("actual_cents").alias("forecast_cents"),
    )
    return (
        daily.join(
            f,
            (F.col("f_type") == F.col("event_type"))
            & (F.col("f_dayno") == F.col("dayno") - 7),
        )
        .select(
            "event_type",
            "day",
            "actual_cents",
            "forecast_cents",
            F.abs(F.col("actual_cents") - F.col("forecast_cents")).alias(
                "abs_err_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Data-freshness pre-flight (round 7): per event_type, how stale the
# stream is against the corpus high-water mark and how gappy its own
# day coverage is — the check a pipeline runs BEFORE training-data
# cutoff decisions (the per-source twin of dq_validation_report's
# referential checks). All-integer epoch-day arithmetic (the round-7
# driver-seam discipline — no engine date_diff convention anywhere).
# Scale shape: one (event_type, day) map-side-combinable groupBy feeds
# both the per-type rollup and the corpus 1-row high-water aggregate;
# the shuffle carries |types| x |days| rows, never events.
# ---------------------------------------------------------------------------

_FRESH_ORACLE = """
WITH days AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
per_type AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS n_events,
         MIN(day) AS first_day,
         MAX(day) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS n_active_days
  FROM days GROUP BY event_type
),
hw AS (SELECT MAX(day) AS corpus_last_day FROM days)
SELECT p.event_type, p.n_events, p.first_day, p.last_day, p.n_active_days,
       hw.corpus_last_day - p.last_day AS staleness_days,
       (p.last_day - p.first_day + 1) - p.n_active_days AS missing_days
FROM per_type p CROSS JOIN hw
"""


@register(
    "dq_freshness_report",
    oracle=_FRESH_ORACLE,
    doc="per-event_type freshness pre-flight: staleness vs the corpus"
        " high-water day and missing-day gaps in own coverage —"
        " all-integer epoch-day arithmetic, |types| x |days| shuffle",
)
def dq_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400.0).cast("bigint").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per_type = days.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_active_days"),
    )
    hw = days.groupBy().agg(F.max("day").alias("corpus_last_day"))
    return per_type.crossJoin(F.broadcast(hw)).select(
        "event_type",
        "n_events",
        "first_day",
        "last_day",
        "n_active_days",
        (F.col("corpus_last_day") - F.col("last_day")).alias("staleness_days"),
        (
            F.col("last_day") - F.col("first_day") + 1 - F.col("n_active_days")
        ).alias("missing_days"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution (round 7): every purchase distributes exactly
# 1000 milli-credits over the user's click/view touches in the prior
# 24 h, U-shaped (first 400 / last 400 / middles share 200), rolled up
# per touch type. INTEGER CREDITS ONLY: fractional models (0.4/0.4/
# 0.2/(k-2)) are float seams at the driver boundary, so the split is
# integer division with the remainder pinned deterministically to the
# EARLIEST middle touch — conservation (sum = 1000 per attributed
# purchase) holds exactly and is pytest-locked. Scale shape: the
# touch-to-purchase pairing is temporal.range_join's bucketed
# equi-join (no theta explosion); the per-purchase window orders <= a
# day of one user's touches.
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_S = 86400
_ATTR_BUCKET_S = 21600

_ATTR_ORACLE = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS pts
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id AS touch_id, user_id, event_type,
         CAST(ts AS TIMESTAMP) AS tts
  FROM events WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT p.purchase_id, t.touch_id, t.event_type, t.tts
  FROM p JOIN t ON t.user_id = p.user_id
   AND t.tts >= p.pts - INTERVAL {_ATTR_LOOKBACK_S} SECOND
   AND t.tts < p.pts
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY tts, touch_id) AS rn,
         COUNT(*) OVER (PARTITION BY purchase_id) AS k
  FROM pairs
),
credited AS (
  SELECT event_type,
         CASE WHEN k = 1 THEN 1000
              WHEN k = 2 THEN 500
              WHEN rn = 1 OR rn = k THEN 400
              ELSE 200 // (k - 2)
                   + CASE WHEN rn = 2 THEN 200 % (k - 2) ELSE 0 END
         END AS credit
  FROM ranked
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touch_credits,
       CAST(SUM(credit) AS BIGINT) AS credit_millis
FROM credited GROUP BY event_type
"""


@register(
    "events_attribution",
    oracle=_ATTR_ORACLE,
    doc="U-shaped multi-touch attribution: 1000 integer milli-credits"
        " per purchase over prior-24h click/view touches (400/400 +"
        " middles share 200, remainder to the earliest middle), bucketed"
        " range join + per-purchase window, per-type rollup",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.temporal import range_join

    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        "event_type",
        F.col("ts").alias("tts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        (F.col("ts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_S} SECOND")).alias(
            "win_start"
        ),
    )
    pairs = range_join(
        touches,
        purchases,
        left_ts="tts",
        right_start="win_start",
        right_end="pts",
        by=["user_id"],
        bucket_s=_ATTR_BUCKET_S,
    ).filter(F.col("tts") < F.col("pts_r"))
    w = Window.partitionBy("purchase_id_r")
    ranked = pairs.withColumn(
        "rn", F.row_number().over(w.orderBy("tts", "touch_id"))
    ).withColumn("k", F.count(F.lit(1)).over(w))
    credit = (
        F.when(F.col("k") == 1, F.lit(1000))
        .when(F.col("k") == 2, F.lit(500))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), F.lit(400))
        .otherwise(
            F.expr("200 div (k - 2)")
            + F.when(F.col("rn") == 2, F.expr("200 % (k - 2)")).otherwise(
                F.lit(0)
            )
        )
    )
    return (
        ranked.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touch_credits"),
            F.sum("credit").cast("bigint").alias("credit_millis"),
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build (round 7): the warehouse load-merge pattern
# the reference's M-step implies — its loaders overwrite the current
# row per entity (national/_1034/__main__.py:91-121 upserts by key); a
# production dimension keeps the HISTORY as validity intervals instead.
# Source feed: one snapshot per (user, day) — the user's modal
# event_type that day (deterministic tie-break: highest count, then
# lexicographically smallest type). The SCD2 pass keeps only CHANGE
# points (value differs from the previous snapshot), numbers versions,
# and derives [valid_from, valid_to) with an open current interval.
# Scale shape: the snapshot aggregate is map-side combinable on
# (user, day, type); every window partitions by user_id (never
# unpartitioned); output is bounded by users x change points, not by
# events. Outputs are keys, strings, integer versions/flags, and day
# timestamps — no floats.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
modal AS (
  SELECT user_id, day, event_type
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
                                 ORDER BY n DESC, event_type) AS rn
    FROM daily
  ) WHERE rn = 1
),
changes AS (
  SELECT * FROM (
    SELECT user_id, day, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY day) AS prev
    FROM modal
  ) WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT)
         AS version,
       event_type,
       day AS valid_from,
       LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS valid_to,
       CAST(CASE WHEN LEAD(day) OVER (PARTITION BY user_id ORDER BY day)
                 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM changes
"""


def scd2_daily_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily modal snapshot feed: per (user, day), the user's modal
    event_type (tie-break: highest count, then lexicographically
    smallest type). Shared by the batch dimension build and the
    streaming twin's test feed so the modal definition lives once."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    )
    daily = ev.groupBy("user_id", "day", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_modal = Window.partitionBy("user_id", "day").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        daily.withColumn("rn", F.row_number().over(w_modal))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "event_type")
    )


@register(
    "dim_scd2_intervals",
    oracle=_SCD2_ORACLE,
    doc="SCD Type-2 dimension build from daily modal-attribute"
        " snapshots: change-point detection, version numbering, and"
        " [valid_from, valid_to) validity intervals with an open"
        " current row — the history-preserving twin of the reference's"
        " overwrite-style M-step",
)
def dim_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    modal = scd2_daily_snapshots(spark, sf_dir)
    w_user = Window.partitionBy("user_id").orderBy("day")
    changes = (
        modal.withColumn("prev", F.lag("event_type").over(w_user))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "day", "event_type")
    )
    return changes.select(
        "user_id",
        F.row_number().over(w_user).cast("bigint").alias("version"),
        "event_type",
        F.col("day").alias("valid_from"),
        F.lead("day").over(w_user).alias("valid_to"),
        F.when(F.lead("day").over(w_user).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_current"),
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time enrichment (round 7): the query a versioned
# dimension EXISTS for — each fact row joined to the dimension version
# valid AT ITS TIMESTAMP. The oracle states the declarative interval
# semantics (user match + valid_from <= ts < valid_to, open current
# row); the Spark side implements the scalable form: dimension change
# points and facts are unioned per user and a single user-keyed
# fill-forward window carries the last version forward onto every fact
# — one shuffle on user_id, no interval/range join, no per-fact probe.
# A dim row at the same instant as a fact sorts FIRST (src 0 < 1), so a
# purchase at exactly valid_from lands in the NEW version — identical
# to the oracle's half-open interval. Every purchase matches exactly
# one version by construction (a user's first version starts at the
# midnight of their first event). Output: purchases per dimension
# segment — all integers.
# ---------------------------------------------------------------------------

_SCD2_PIT_ORACLE = f"""
WITH dim AS ({_SCD2_ORACLE.strip()}),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT d.event_type AS segment,
       COUNT(*) AS n_events,
       COUNT(DISTINCT p.user_id) AS n_users
FROM p
JOIN dim d ON d.user_id = p.user_id
          AND p.ts >= d.valid_from
          AND (d.valid_to IS NULL OR p.ts < d.valid_to)
GROUP BY d.event_type
ORDER BY segment
"""


@register(
    "dim_scd2_point_in_time",
    oracle=_SCD2_PIT_ORACLE,
    doc="point-in-time join of purchases against the SCD2 dimension:"
        " oracle states interval semantics, Spark implements the"
        " union + user-keyed fill-forward window (one shuffle, no range"
        " join); purchases per dimension segment, all-integer output",
)
def dim_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = dim_scd2_intervals(spark, sf_dir).select(
        "user_id",
        F.col("valid_from").alias("t"),
        F.col("event_type").alias("seg"),
        F.lit(0).alias("src"),
    )
    p = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id", F.col("ts").alias("t"), F.lit(None).cast("string").alias("seg"),
        F.lit(1).alias("src"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = (
        dim.unionByName(p)
        .withColumn("segment", F.last("seg", ignorenulls=True).over(w))
        .filter(F.col("src") == 1)
    )
    return (
        enriched.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Time-bounded funnel (round 7): the product-analytics form of the
# funnel — each step must happen WITHIN A WINDOW of the previous one
# (click within 30 minutes of the first view, purchase within 24 hours
# of that click), not merely after it (events_funnel's unbounded
# chain). Greedy first-touch semantics, fully deterministic: the
# user's FIRST view anchors the chain, then the first qualifying
# click, then the first qualifying purchase — stated identically on
# both engines as three MIN-aggregate hops. Scale shape: three
# user-keyed combinable aggregates and two equi-joins on user_id —
# no range join, no window over events. Output: 3 stage rows with
# integer user counts and permille retention.
# ---------------------------------------------------------------------------

_TF_CLICK_WINDOW = "INTERVAL 30 MINUTE"
_TF_BUY_WINDOW = "INTERVAL 24 HOUR"

_TIMED_FUNNEL_ORACLE = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS vts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS cts
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND e.ts > v.vts AND e.ts <= v.vts + {_TF_CLICK_WINDOW}
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS pts
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.cts AND e.ts <= c.cts + {_TF_BUY_WINDOW}
  GROUP BY e.user_id
),
counts AS (
  SELECT (SELECT COUNT(*) FROM v) AS n_view,
         (SELECT COUNT(*) FROM c) AS n_click,
         (SELECT COUNT(*) FROM p) AS n_buy
)
SELECT stage, n_users, retained_permille FROM (
  SELECT 1 AS ord, 'view' AS stage, CAST(n_view AS BIGINT) AS n_users,
         CAST(1000 AS BIGINT) AS retained_permille FROM counts
  UNION ALL
  SELECT 2, 'click_30m', CAST(n_click AS BIGINT),
         CAST(n_click * 1000 // n_view AS BIGINT) FROM counts
  UNION ALL
  SELECT 3, 'purchase_24h', CAST(n_buy AS BIGINT),
         CAST(CASE WHEN n_click = 0 THEN 0
                   ELSE n_buy * 1000 // n_click END AS BIGINT) FROM counts
) t ORDER BY ord
"""


@register(
    "events_timed_funnel",
    oracle=_TIMED_FUNNEL_ORACLE,
    doc="time-bounded funnel: click within 30min of first view, purchase"
        " within 24h of that click — greedy first-touch MIN-aggregate"
        " hops, user-keyed equi-joins only, integer permille retention",
)
def events_timed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("vts"))
            & (F.col("ts") <= F.col("vts") + F.expr(_TF_CLICK_WINDOW))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("cts"))
            & (F.col("ts") <= F.col("cts") + F.expr(_TF_BUY_WINDOW))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_click"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_buy"))))
    )
    stages = counts.selectExpr(
        "stack(3,"
        " 1, 'view', cast(n_view as bigint), cast(1000 as bigint),"
        " 2, 'click_30m', cast(n_click as bigint),"
        "    cast(n_click * 1000 div n_view as bigint),"
        " 3, 'purchase_24h', cast(n_buy as bigint),"
        "    cast(case when n_click = 0 then 0"
        "         else n_buy * 1000 div n_click end as bigint)"
        ") as (ord, stage, n_users, retained_permille)"
    )
    return stages.orderBy("ord").select("stage", "n_users", "retained_permille")


# ---------------------------------------------------------------------------
# Funnel with exclusion (round 7): the sequential-pattern class with a
# NEGATIVE condition — users who viewed then purchased WITHOUT an error
# between the two. This is the MATCH_RECOGNIZE shape (A ... C with no B
# between) stated engine-portably as MIN-aggregate hops: first view,
# first error after it, first purchase after it; the purchase converts
# only if it precedes the error (absent error = infinity, expressed as
# a COALESCE comparison both engines fold identically). Scale shape:
# three user-keyed combinable aggregates + equi-joins, no window over
# raw events, no pattern automaton state. Integer counts + permille.
# ---------------------------------------------------------------------------

_EXCL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS vts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
e AS (
  SELECT x.user_id, MIN(x.ts) AS ets
  FROM events x JOIN v ON v.user_id = x.user_id
  WHERE x.event_type = 'error' AND x.ts > v.vts
  GROUP BY x.user_id
),
p AS (
  SELECT x.user_id, MIN(x.ts) AS pts
  FROM events x JOIN v ON v.user_id = x.user_id
  WHERE x.event_type = 'purchase' AND x.ts > v.vts
  GROUP BY x.user_id
),
flags AS (
  SELECT v.user_id,
         CASE WHEN p.pts IS NOT NULL THEN 1 ELSE 0 END AS purchased,
         CASE WHEN p.pts IS NOT NULL
               AND (e.ets IS NULL OR p.pts < e.ets) THEN 1 ELSE 0 END AS clean
  FROM v
  LEFT JOIN e ON e.user_id = v.user_id
  LEFT JOIN p ON p.user_id = v.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers,
       CAST(SUM(purchased) AS BIGINT) AS n_purchased,
       CAST(SUM(clean) AS BIGINT) AS n_clean_path,
       CAST(SUM(clean) * 1000 // COUNT(*) AS BIGINT) AS clean_permille
FROM flags
"""


@register(
    "events_funnel_with_exclusion",
    oracle=_EXCL_ORACLE,
    doc="sequential pattern with a negative condition (view ... purchase"
        " with NO error between): MIN-aggregate hops + coalesce-ordered"
        " comparison, no pattern-automaton state; integer permille",
)
def events_funnel_with_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ets"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    flags = (
        v.join(e, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            F.when(F.col("pts").isNotNull(), 1).otherwise(0).alias("purchased"),
            F.when(
                F.col("pts").isNotNull()
                & (F.col("ets").isNull() | (F.col("pts") < F.col("ets"))),
                1,
            )
            .otherwise(0)
            .alias("clean"),
        )
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_viewers"),
        F.sum("purchased").cast("bigint").alias("n_purchased"),
        F.sum("clean").cast("bigint").alias("n_clean_path"),
        F.expr("cast(sum(clean) * 1000 div count(1) as bigint)").alias(
            "clean_permille"
        ),
    )


# ---------------------------------------------------------------------------
# Interval union (round 7): total covered time per user from
# OVERLAPPING intervals — the billing/uptime primitive ("sum of session
# lengths" double-counts overlap; the union does not). Each event opens
# a deterministic interval [ts, ts + (event_id % 120 + 1) minutes); the
# sweep-line is the textbook island construction: order a user's
# intervals by start, carry a running MAX of end over the preceding
# rows, start a new island when the current start exceeds it, then sum
# island extents. All windows are user-keyed; output is integer minutes
# (interval bounds are whole minutes by construction, so the
# epoch-difference is exact). Scale shape: one user-keyed sort window
# chain, one groupBy — no self-join of intervals, no explode to
# per-minute rows (the naive relational encodings that die at scale).
# ---------------------------------------------------------------------------

_IVU_ORACLE = """
WITH iv AS (
  SELECT user_id, ts AS s,
         ts + (event_id % 120 + 1) * INTERVAL 1 MINUTE AS e
  FROM events
),
marked AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv
),
grp AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
islands AS (
  SELECT user_id, island, MIN(s) AS is_s, MAX(e) AS is_e
  FROM grp GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(epoch_us(is_e) - epoch_us(is_s)) // 60000000 AS BIGINT)
         AS covered_minutes
FROM islands
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "events_interval_union",
    oracle=_IVU_ORACLE,
    doc="overlapping-interval union per user (sweep-line islands via"
        " running-max-end): island count + exact covered minutes —"
        " no interval self-join, no per-minute explode",
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (
            F.col("ts")
            + (F.col("event_id") % 120 + 1) * F.expr("INTERVAL 1 MINUTE")
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    marked = ev.withColumn(
        "prev_max_e",
        F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    grp = marked.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = grp.groupBy("user_id", "island").agg(
        F.min("s").alias("is_s"), F.max("e").alias("is_e")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            # integer MICROSECONDS on both engines: second-truncating
            # functions differ when island bounds come from rows with
            # different sub-second parts
            F.expr(
                "cast(sum(unix_micros(is_e) - unix_micros(is_s))"
                " div 60000000 as bigint)"
            ).alias("covered_minutes"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# New vs returning users per day (round 7): the product-analytics
# staple the retention matrix doesn't directly emit — each active
# (user, day) is "new" iff the day is the user's first-ever active day.
# Scale shape: one distinct (user, day) collapse, one per-user MIN
# (both map-side combinable, same shuffle key), one equi-join back, one
# day-keyed count. Integer permille, no doubles.
# ---------------------------------------------------------------------------

_NVR_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
first_day AS (SELECT user_id, MIN(day) AS fday FROM ud GROUP BY user_id)
SELECT ud.day,
       CAST(SUM(CASE WHEN ud.day = f.fday THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN ud.day = f.fday THEN 0 ELSE 1 END) AS BIGINT)
         AS n_returning,
       CAST(SUM(CASE WHEN ud.day = f.fday THEN 1 ELSE 0 END) * 1000
            // COUNT(*) AS BIGINT) AS new_permille
FROM ud JOIN first_day f ON f.user_id = ud.user_id
GROUP BY ud.day
ORDER BY ud.day
"""


@register(
    "events_new_vs_returning",
    oracle=_NVR_ORACLE,
    doc="new vs returning active users per day (new = user's first-ever"
        " active day): distinct user-day collapse + per-user MIN on the"
        " same shuffle key, integer permille",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    first_day = ud.groupBy("user_id").agg(F.min("day").alias("fday"))
    is_new = F.when(F.col("day") == F.col("fday"), 1).otherwise(0)
    return (
        ud.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.sum(is_new).cast("bigint").alias("n_new"),
            F.sum(1 - is_new).cast("bigint").alias("n_returning"),
            F.expr(
                "cast(sum(case when day = fday then 1 else 0 end) * 1000"
                " div count(1) as bigint)"
            ).alias("new_permille"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# CUSUM alarms (round 7): sequential change-point detection over daily
# revenue — the classic c_i = max(0, c_{i-1} + x_i - target - slack)
# recurrence that flags a sustained shift long before a per-day z-score
# does. The recurrence looks non-windowable, but the exact prefix-min
# identity linearizes it: with S_i the plain cumulative sum of
# (x - target - slack) and S_0 = 0,  c_i = S_i - min(S_0..S_i).  Both
# sides therefore compute it with two type-keyed cumulative windows
# (sum, then min clamped at zero) — pure integer arithmetic, no
# higher-order fold (a struct-accumulator list_reduce was measured to
# evaluate fields against the UPDATED accumulator in DuckDB 1.0, an
# engine quirk the identity sidesteps entirely). Parameters derive from
# the data as integers: target = total div n_days, slack = target div
# 20, alarm threshold = target. Windows partition by event_type over
# calendar-bounded day rows.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dayno,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
params AS (
  SELECT event_type, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS target,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
),
pref AS (
  SELECT d.event_type, d.dayno, p.target, p.n_days,
         SUM(d.cents - p.target - p.target // 20)
           OVER (PARTITION BY d.event_type ORDER BY d.dayno
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM daily d JOIN params p USING (event_type)
),
cus AS (
  SELECT event_type, target, n_days,
         s - LEAST(CAST(0 AS BIGINT),
                   MIN(s) OVER (PARTITION BY event_type ORDER BY dayno
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)) AS c
  FROM pref
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days, target AS target_cents,
       CAST(MAX(c) AS BIGINT) AS max_cusum_cents,
       CAST(SUM(CASE WHEN c > target THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm_days
FROM cus
GROUP BY event_type, n_days, target
ORDER BY event_type
"""


@register(
    "events_cusum_alarm",
    oracle=_CUSUM_ORACLE,
    doc="sequential CUSUM change-point alarms over daily integer cents,"
        " linearized by the exact prefix-min identity"
        " (c_i = S_i - min(S_0..S_i)) into two type-keyed cumulative"
        " windows — no higher-order fold, no engine lambda semantics",
)
def events_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr(
                "cast(unix_micros(date_trunc('day', ts)) div 86400000000"
                " as bigint)"
            ).alias("dayno"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "dayno")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    params = daily.groupBy("event_type").agg(
        F.expr("cast(sum(cents) div count(1) as bigint)").alias("target"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dayno")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = daily.join(params, "event_type").withColumn(
        "s",
        F.sum(
            F.col("cents") - F.col("target") - F.expr("target div 20")
        ).over(w),
    )
    cus = pref.withColumn(
        "c", F.col("s") - F.least(F.lit(0).cast("bigint"), F.min("s").over(w))
    )
    return (
        cus.groupBy("event_type", "n_days", F.col("target").alias("target_cents"))
        .agg(
            F.max("c").cast("bigint").alias("max_cusum_cents"),
            F.sum(F.when(F.col("c") > F.col("target"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_alarm_days"),
        )
        .select(
            "event_type", "n_days", "target_cents",
            "max_cusum_cents", "n_alarm_days",
        )
        .orderBy("event_type")
    )
