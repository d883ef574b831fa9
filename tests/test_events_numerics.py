"""Cross-engine numeric regression: events_zscore with FINE-decimal day
totals. The sf fixtures' values happen to produce coarse day totals, so
the oracle gate alone would not catch a decimal-typing divergence in the
sum-of-squares (Spark truncates a decimal*decimal product to scale 6
under precision-loss rules; DuckDB keeps scale 20). This test plants
values whose squares carry >6 decimal places and compares the registered
builder against the registered oracle on the same parquet."""

from __future__ import annotations

import duckdb
import pandas as pd


def test_events_zscore_fine_decimals_match_oracle(spark, tmp_path):
    from sig_etl_spark.queries import QUERIES

    rows = []
    eid = 0
    for d in range(4):
        for i in range(3):
            eid += 1
            rows.append(
                (
                    eid,
                    pd.Timestamp(2024, 1, 1 + d, 3 * i),
                    eid % 5,
                    "click" if eid % 2 else "view",
                    2.0005 + d * 0.3751 + i * 0.0013,  # squares need scale > 6
                    "{}",
                )
            )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))

    rq = QUERIES["events_zscore"]
    sdf = rq.builder(spark, str(tmp_path)).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    odf = con.execute(rq.oracle).df()

    key = ["event_type", "day"]
    s = sdf.sort_values(key).reset_index(drop=True)
    o = odf.sort_values(key).reset_index(drop=True)
    assert len(s) == len(o)
    for c in ["day_total", "zscore"]:
        assert (s[c].values == o[c].values).all(), (
            c,
            s[c].values,
            o[c].values,
        )


def test_retention_max_days_cap(spark, sf_dir):
    """max_days caps each user at their first N active days; the cohort
    day is unchanged. Default (None) remains the oracle path."""
    from pyspark.sql import functions as F

    from sig_etl_spark.queries.events_demo import events_retention

    full = events_retention(spark, sf_dir)
    capped = events_retention(spark, sf_dir, max_days=2)
    # cohort days identical (slice keeps the earliest days)
    assert {r.cohort_day for r in capped.collect()} <= {
        r.cohort_day for r in full.collect()
    }
    # each user contributes at most 2 rows -> total user-rows shrink
    n_full = full.agg(F.sum("n_users")).collect()[0][0]
    n_capped = capped.agg(F.sum("n_users")).collect()[0][0]
    assert n_capped <= n_full
    # every user still appears exactly once at offset 0
    day0_full = {r.cohort_day: r.n_users for r in full.filter("day_offset = 0").collect()}
    day0_capped = {r.cohort_day: r.n_users for r in capped.filter("day_offset = 0").collect()}
    assert day0_full == day0_capped


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """The staged state+increment merge must equal the one-shot rollup
    row-for-row — idempotence under tail replay."""
    from pyspark.sql import functions as F

    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.tables import load_table

    merged = QUERIES["events_incremental_merge"].builder(spark, sf_dir)
    full = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
