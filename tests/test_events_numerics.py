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
