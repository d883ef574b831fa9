"""Oracle-checked VSDB query-layer demos (SURVEY §7 Phase 5).

The real deployment feeds vsdb.py from JDBC; here the same builders run
over dimension frames synthesized deterministically from the TPC-H tables
(candidate <- customer, election <- orders, office <- nation), so the
DuckDB oracle can re-express the whole pipeline:

- vsdb_election_candidates: queries/election_candidates_by_electionyear.sql
  shape — ANY-list filters (J8), keep-first per candidate (W3), broadcast
  office join (J1/J3), PLUS the S13 reference-map hop: office_id resolved
  to a name through the collected office_list dict applied as a literal
  map (votervoice/match.py:32-35 builds exactly this lookup).
- a9_reindex: dense 0-based row ids in deterministic order
  (templates/template_extract.py re-index-before-save).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sig_etl_spark import vsdb
from sig_etl_spark.extract.spark_io import reindex
from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

_YEARS = [1995, 1996, 1997]
_STAGES = ["G", "P"]


def _dims(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    candidate = cust.select(
        F.col("c_custkey").alias("candidate_id"),
        F.col("c_name").alias("candidate_name"),
    )
    election = orders.select(
        F.col("o_orderkey").alias("election_id"),
        F.col("o_custkey").alias("candidate_id"),
        F.year("o_orderdate").alias("election_year"),
        F.when(F.col("o_orderkey") % 2 == 0, "G").otherwise("P").alias("stage"),
        (F.col("o_orderkey") % 10).alias("state_id"),
        (F.col("o_orderkey") % 25).alias("office_id"),
    )
    office = nation.select(
        F.col("n_nationkey").alias("office_id"),
        F.col("n_name").alias("name"),
        F.col("n_nationkey").alias("rank"),
    )
    return candidate, election, office


_ELECTION_ORACLE = f"""
WITH candidate AS (
  SELECT c_custkey AS candidate_id, c_name AS candidate_name FROM customer
),
election AS (
  SELECT o_orderkey AS election_id, o_custkey AS candidate_id,
         EXTRACT(year FROM o_orderdate) AS election_year,
         CASE WHEN o_orderkey % 2 = 0 THEN 'G' ELSE 'P' END AS stage,
         o_orderkey % 10 AS state_id,
         o_orderkey % 25 AS office_id
  FROM orders
),
office AS (
  SELECT n_nationkey AS office_id, n_name AS name FROM nation
),
filtered AS (
  SELECT * FROM election
  WHERE election_year IN ({",".join(str(y) for y in _YEARS)})
    AND stage IN ({",".join("'" + s + "'" for s in _STAGES)})
),
joined AS (
  SELECT c.candidate_id, c.candidate_name, f.election_id,
         CAST(f.election_year AS INTEGER) AS election_year, f.stage,
         f.state_id, f.office_id, o.name AS office_name,
         row_number() OVER (PARTITION BY c.candidate_id
                            ORDER BY f.election_year DESC, f.election_id ASC) AS rn
  FROM candidate c
  JOIN filtered f USING (candidate_id)
  LEFT JOIN office o USING (office_id)
)
SELECT candidate_id, candidate_name, election_id, election_year, stage,
       state_id, office_id, office_name
FROM joined WHERE rn = 1
"""


@register(
    "vsdb_election_candidates",
    oracle=_ELECTION_ORACLE,
    doc="J3/J8/W3/S13: election_candidates_by_electionyear + reference-map"
        " office-name lookup",
)
def vsdb_election_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    candidate, election, office = _dims(spark, sf_dir)
    kept = vsdb.election_candidates_by_year(
        candidate, election, office.drop("name"), years=_YEARS, stages=_STAGES
    )
    # S13/J3: two-column office list -> driver dict -> literal-map lookup
    # (the reference builds {office_id: name} and indexes it per row).
    ref_map = vsdb.as_reference_map(vsdb.office_list(office), "office_id", "name")
    # Literal-map lookup with an explicit null-on-miss (LEFT JOIN
    # semantics). Comparing normalize_via_map's pass-through output to
    # its input would misfire on identity mappings (a name equal to its
    # id string); try_element_at distinguishes miss (null) from identity.
    office_name = F.try_element_at(
        F.create_map(
            *[F.lit(x) for kv in ref_map.items() for x in (str(kv[0]), kv[1])]
        ),
        F.col("office_id").cast("string"),
    )
    return kept.select(
        "candidate_id",
        "candidate_name",
        "election_id",
        F.col("election_year").cast("int").alias("election_year"),
        "stage",
        "state_id",
        "office_id",
        office_name.alias("office_name"),
    )


_REINDEX_ORACLE = """
SELECT r_name, r_regionkey,
       CAST(row_number() OVER (ORDER BY r_name, r_regionkey) - 1 AS BIGINT) AS row_id
FROM region
"""


@register(
    "a9_reindex",
    oracle=_REINDEX_ORACLE,
    doc="A9: dense 0-based re-index in deterministic order",
)
def a9_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    return reindex(region.select("r_name", "r_regionkey"), ["r_name", "r_regionkey"])
