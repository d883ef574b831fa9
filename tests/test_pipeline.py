"""E→T→M pipeline runner + VSDB query layer + explode tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sig_etl_spark.extract import extract_table_records
from sig_etl_spark.functions import parse_name
from sig_etl_spark.functions.explode import split_multi_candidate
from sig_etl_spark.linkage import ColumnRule, MatchConfig, fuzzy_match
from sig_etl_spark.pipeline import Pipeline
from sig_etl_spark import vsdb

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ratings_table.html")


def _build_pipeline(spark, tmp_path):
    def extract(spark_, _):
        with open(FIXTURE) as f:
            recs = extract_table_records(f.read())
        return spark_.createDataFrame(
            [(r["Name"], r["Party"], r["Score"]) for r in recs],
            ["name", "party", "score"],
        )

    def transform(_, df):
        parts = parse_name(F.col("name"))
        return df.select(
            "name", "party", "score",
            parts["firstname"].alias("firstname"),
            parts["lastname"].alias("lastname"),
        )

    def match(spark_, df):
        dim = spark_.createDataFrame(
            [(1, "R", "John", "Smith"), (2, "D", "Mary", "Public"), (3, "I", "Jane", "Roe")],
            ["y_id", "party", "y_first", "y_last"],
        )
        cfg = MatchConfig(
            rules=(
                ColumnRule("firstname", ("y_first",), scorer="levenshtein", threshold=80.0),
                ColumnRule("lastname", ("y_last",), scorer="levenshtein", threshold=80.0),
            ),
            block_on=("party",),
            required_threshold=80.0,
        )
        return fuzzy_match(df, dim, cfg)

    return Pipeline(
        spark=spark,
        workdir=str(tmp_path / "work"),
        base_name="2024_NA_Test_Ratings-",
        stages={"extract": extract, "transform": transform, "match": match},
    )


def test_pipeline_end_to_end_and_reentry(spark, tmp_path):
    pipe = _build_pipeline(spark, tmp_path)
    out = pipe.run()
    rows = {r.name: r for r in out.collect()}
    assert rows["Rep. John Smith"].candidate_id == 1
    assert rows["Rep. John Smith"].match_status == "matched"
    assert rows["Jane Roe"].candidate_id == 3
    # checkpoints exist per stage
    for stage in ("extract", "transform", "match"):
        assert os.path.exists(pipe.checkpoint_path(stage))

    # stage re-entry: re-run match alone from the transform checkpoint
    out2 = pipe.run(from_stage="match", to_stage="match")
    assert {r.name: r.candidate_id for r in out2.collect()} == {
        k: v.candidate_id for k, v in rows.items()
    }


def test_vsdb_queries(spark):
    candidate = spark.createDataFrame(
        [(1, "Smith"), (2, "Jones"), (3, "Lee")], ["candidate_id", "lastname"]
    )
    election = spark.createDataFrame(
        [
            (10, 1, 2022, "G", "TX", 100),
            (11, 1, 2024, "G", "TX", 100),  # keep-first picks the newest year
            (12, 2, 2024, "P", "CA", 200),
            (13, 3, 2020, "G", "NY", 300),  # filtered out by years
        ],
        ["election_id", "candidate_id", "election_year", "stage", "state_id", "office_id"],
    )
    office = spark.createDataFrame(
        [(100, "U.S. House", 1), (200, "Governor", 2)], ["office_id", "name", "rank"]
    )
    out = vsdb.election_candidates_by_year(
        candidate, election, office, years=[2022, 2024], stages=["G", "P"]
    )
    rows = {r.candidate_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].election_year == 2024  # DISTINCT ON -> newest first
    assert rows[2].name == "Governor"

    congstatus = spark.createDataFrame(
        [(1, 1, "2023-06-01", 50), (2, 1, "2019-01-01", 51), (3, 2, "2023-01-15", 52)],
        ["congstatus_id", "candidate_id", "statusdate", "dummy"],
    ).withColumn("statusdate", F.to_date("statusdate")).withColumn("office_id", F.lit(100))
    out2 = vsdb.office_candidates_by_congstatus(
        candidate, congstatus, office, "2023-01-01", "2024-12-31"
    )
    rows2 = {r.candidate_id: r for r in out2.collect()}
    assert set(rows2) == {1, 2}  # 2019 status outside the term window

    params = vsdb.derive_params(election, {"years": "election_year", "states": "state_id"})
    assert params == {"years": [2020, 2022, 2024], "states": ["CA", "NY", "TX"]}
    ref = vsdb.as_reference_map(vsdb.office_list(office), "name", "office_id")
    assert ref == {"U.S. House": 100, "Governor": 200}


def test_split_multi_candidate_semantics(spark):
    df = spark.createDataFrame(
        [("A / B", "R / D", "TX"), ("C", "I", "OH")], ["nm", "party", "state"]
    )
    out = split_multi_candidate(df, ["nm", "party"]).orderBy("state", "candidacy").collect()
    assert [(r.nm, r.party, r.state, r.candidacy) for r in out] == [
        ("C", "I", "OH", 1),
        ("A", "R", "TX", 1),
        ("B", "D", "TX", 2),
    ]
    # shorter split column repeats its single value
    df2 = spark.createDataFrame([("A / B", "R")], ["nm", "party"])
    out2 = split_multi_candidate(df2, ["nm", "party"]).orderBy("candidacy").collect()
    assert [(r.nm, r.party) for r in out2] == [("A", "R"), ("B", "R")]
