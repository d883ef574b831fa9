"""VSDB candidate-dimension query layer (SURVEY §7 Phase 5).

The reference runs four parameterized SQL files against the VSDB Postgres
(/root/reference/queries/*.sql) with parameter sets derived from the
scraped data (/root/reference/votervoice/match.py:104-126,
/root/reference/national/_1034/match.py:85-102). Here each query is a
DataFrame builder over caller-supplied dimension frames (JDBC sources or
parquet snapshots — either way the same plan), with the two
Postgres-isms rewritten:

- ``DISTINCT ON (k)`` -> row_number window with an explicit total order
  (Spark has no DISTINCT ON; tie order made deterministic, SURVEY §7
  risk (4));
- ``col = ANY(%(list)s)`` -> ``col.isin(list)``, with the lists derived
  from the scraped frame via collect_set (bounded driver collect: the
  value sets are offices/states/years, not row-scale data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derive_params(x: DataFrame, cols: dict[str, str]) -> dict[str, list]:
    """A4/A5 parameter derivation: {param_name: x_column} -> value lists.

    One job collects every distinct set (single pass, grouped into one
    agg) — mirrors the reference building office/state/year params before
    querying.
    """
    aggs = [F.collect_set(src).alias(name) for name, src in cols.items()]
    row = x.agg(*aggs).first()
    return {name: sorted(row[name]) for name in cols}


def election_candidates_by_year(
    candidate: DataFrame,
    election: DataFrame,
    office: DataFrame,
    years: list,
    stages: list | None = None,
    state_ids: list | None = None,
) -> DataFrame:
    """queries/election_candidates_by_electionyear.sql re-expressed:
    candidate ⋈ election ⋈ office with ANY-list filters and keep-first per
    candidate_id."""
    el = election.filter(F.col("election_year").isin(years))
    if stages:
        el = el.filter(F.col("stage").isin(stages))
    if state_ids:
        el = el.filter(F.col("state_id").isin(state_ids))
    joined = (
        candidate.join(el, "candidate_id")
        .join(F.broadcast(office), "office_id", "left")
    )
    w = Window.partitionBy("candidate_id").orderBy(
        F.col("election_year").desc(), F.col("election_id").asc()
    )
    return joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")


def office_candidates_by_congstatus(
    candidate: DataFrame,
    congstatus: DataFrame,
    office: DataFrame,
    term_start,
    term_end,
    office_ids: list | None = None,
) -> DataFrame:
    """queries/office-candidates_by_congstatus.sql re-expressed: the
    CROSS JOIN local_var scalar CTE (J6) becomes literal columns; the
    status-date interval predicate (J7) is a BETWEEN on those literals."""
    cs = congstatus.filter(
        F.col("statusdate").between(F.lit(term_start), F.lit(term_end))
    )
    joined = candidate.join(cs, "candidate_id").join(
        F.broadcast(office), "office_id", "left"
    )
    if office_ids:
        joined = joined.filter(F.col("office_id").isin(office_ids))
    w = Window.partitionBy("candidate_id").orderBy(
        F.col("statusdate").desc(), F.col("congstatus_id").asc()
    )
    return joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")


def office_list(office: DataFrame) -> DataFrame:
    """queries/office_list.sql: (office_id, name) ordered by rank — the
    J3 reference-map source; broadcast-join it or collect to a literal map."""
    return office.select("office_id", "name", "rank").orderBy("rank")


def state_list(state: DataFrame) -> DataFrame:
    """queries/state_list.sql: state_id -> state_name, ordered."""
    return state.select("state_id", "state_name").orderBy("state_id")


def as_reference_map(df: DataFrame, key: str, value: str) -> dict:
    """S13: two-column result -> lookup dict
    (/root/reference/votervoice/match.py:32-35). Driver-side by design:
    reference maps are small dimensions."""
    return {r[key]: r[value] for r in df.select(key, value).collect()}
