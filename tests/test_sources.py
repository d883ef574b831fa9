"""Source/sink tests: CSV NaN-policy round-trip, ANY-list rendering."""

from __future__ import annotations

from sig_etl_spark.sources import read_stage_csv, render_any_list, write_stage_csv


def test_csv_stage_roundtrip_nan_policy(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "", None, "nan-like"), ("b", "x", "y", "")],
        ["k", "empty", "null_col", "other"],
    )
    path = str(tmp_path / "stage.csv")
    write_stage_csv(df, path)
    back = read_stage_csv(spark, path)
    rows = {r.k: r for r in back.collect()}
    # nulls survive as nulls (written as the literal 'nan')
    assert rows["a"].null_col is None
    # empty strings survive as empty strings, NOT null (keep_default_na=False)
    assert rows["a"].empty == ""
    assert rows["b"].other == ""
    assert rows["b"].null_col == "y"


def test_render_any_list():
    assert render_any_list("office_id", [1, 2, 3]) == "office_id IN (1, 2, 3)"
    assert (
        render_any_list("state_id", ["TX", "O'Hare"])
        == "state_id IN ('TX', 'O''Hare')"
    )
    assert render_any_list("x", []) == "FALSE"
