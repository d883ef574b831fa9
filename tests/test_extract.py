"""Golden-extract tests (SURVEY §5.2): fixture pages -> expected record
batches, plus the full Spark landing-zone pipeline."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sig_etl_spark.extract import (
    extract_card_records,
    extract_nested_records,
    extract_records,
    extract_sectioned_records,
    extract_table_records,
    read_landing,
    reindex,
    stabilize_columns,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture(name: str) -> str:
    with open(os.path.join(FIXTURES, name)) as f:
        return f.read()


def test_table_scan_golden():
    recs = extract_table_records(_fixture("ratings_table.html"))
    assert recs == [
        {"Name": "Rep. John Smith", "Party": "R", "Score": "87"},
        {"Name": "Sen. Mary Q. Public, Jr.", "Party": "D", "Score": "42"},
        {"Name": "Jane Roe", "Party": "I", "Score": "100"},
    ]


def test_card_scan_golden():
    recs = extract_card_records(_fixture("endorsements_cards.html"))
    assert recs == [
        {"name": "Alice Adams", "office": "Governor",
         "candidate_url": "/candidates/alice-adams"},
        {"name": "Bob Brown", "office": "Attorney General", "grade": "A+",
         "candidate_url": "/candidates/bob-brown"},
        {"name": "Carol Clark"},
    ]


def test_nested_scan_inherits_outer_attrs():
    recs = extract_nested_records(_fixture("nested_elections.html"))
    assert len(recs) == 4
    assert recs[0] == {
        "location": "Texas", "date": "November 5,2024",
        "office": "U.S. Senate", "name": "Dan Diaz", "endorsed": "True",
    }
    assert recs[3]["location"] == "Ohio" and recs[3]["office"] == "U.S. House"


def test_sectioned_scan_raw_sections():
    recs = extract_sectioned_records(_fixture("sectioned_scorecard.html"))
    assert [r["section"] for r in recs] == ["U.S. Senate - District 1", "", "Governor"]
    assert recs[1]["col0"] == "Iris Irwin"


@pytest.fixture()
def landing_dir(tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    for name in ("ratings_table.html", "endorsements_cards.html"):
        shutil.copy(os.path.join(FIXTURES, name), land / name)
    (land / "ignore.txt").write_text("not html")
    return str(land)


def test_landing_pipeline_end_to_end(spark, landing_dir):
    pages = read_landing(spark, landing_dir)  # glob filters the .txt out
    assert pages.count() == 2

    tables = extract_records(
        pages.filter(F.col("path").contains("ratings_table")),
        parser="table",
        partition_pattern=r"/([^/]+)\.html$",
    )
    flat = stabilize_columns(tables)
    flat = reindex(flat, ["modificationTime", "path", "row_idx"])
    rows = flat.orderBy("row_id").collect()
    assert [r.row_id for r in rows] == [0, 1, 2]
    assert rows[0].Name == "Rep. John Smith"
    assert rows[0].partition == "ratings_table"
    # explicit key list keeps the schema fixed even if a page lacks a column
    subset = stabilize_columns(tables, keys=["Name", "Score", "Missing"])
    r0 = subset.orderBy("row_idx").first()
    assert r0.Score == "87" and r0.Missing is None


def test_stabilize_columns_max_keys_caps_ragged_corpus(spark):
    """A pathological ragged corpus (a fresh map key minted per row) must
    not turn key discovery into an unbounded driver-side collect: with
    max_keys=k the output schema carries exactly the k most frequent
    keys (name-ordered ties), and the common keys always survive."""
    rows = [
        {"id": i, "record": {"common": f"c{i}", f"unique_{i:04d}": "x"}}
        for i in range(200)
    ]
    # one second-tier key shared by half the rows
    for r in rows[::2]:
        r["record"]["shared"] = "s"
    df = spark.createDataFrame(rows, "id int, record map<string,string>")

    capped = stabilize_columns(df, max_keys=2)
    assert set(capped.columns) == {"id", "common", "shared"}
    got = capped.orderBy("id").limit(2).collect()
    assert got[0].common == "c0" and got[0].shared == "s"
    assert got[1].common == "c1" and got[1].shared is None

    # cap boundary inside the unique tier: deterministic by key name
    capped3 = stabilize_columns(df, max_keys=3)
    assert set(capped3.columns) == {"id", "common", "shared", "unique_0000"}


def test_fill_forward_window_after_sectioned_parse(spark, landing_dir):
    # W4: parser emits raw sections; Spark window fills them forward
    import pandas as pd

    recs = extract_sectioned_records(_fixture("sectioned_scorecard.html"))
    df = spark.createDataFrame(pd.DataFrame(recs).assign(pos=range(len(recs))))
    from pyspark.sql import Window

    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    header = F.when(F.col("section") != "", F.col("section"))
    filled = df.withColumn("section_filled", F.last(header, ignorenulls=True).over(w))
    assert [r.section_filled for r in filled.orderBy("pos").collect()] == [
        "U.S. Senate - District 1", "U.S. Senate - District 1", "Governor",
    ]


def test_latest_files_and_slice_records(spark, tmp_path):
    # O1: mtime-ranked newest batch; P4: positional record slice
    import os

    from sig_etl_spark.extract import (
        extract_records,
        latest_files,
        read_landing,
        slice_records,
        stabilize_columns,
    )

    for i in range(4):
        p = tmp_path / f"page_{i}.html"
        p.write_text(
            "<table><thead><tr><th>k</th></tr></thead><tbody>"
            + "".join(f"<tr><td>{i}-{j}</td></tr>" for j in range(3))
            + "</tbody></table>"
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    landed = read_landing(spark, str(tmp_path), glob="*.html")
    newest = latest_files(landed, 2)
    paths = sorted(r.path.rsplit("/", 1)[1] for r in newest.select("path").collect())
    assert paths == ["page_2.html", "page_3.html"]

    records = extract_records(newest, parser="table")
    flat = stabilize_columns(slice_records(records, start=1, stop=3), keys=["k"])
    ks = sorted(r.k for r in flat.collect())
    assert ks == ["2-1", "2-2", "3-1", "3-2"]
