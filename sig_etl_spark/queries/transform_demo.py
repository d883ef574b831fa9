"""Oracle-checked transform queries: dual-candidacy row splitting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sig_etl_spark.functions.explode import split_multi_candidate
from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

# Reference: national/_1034/transform.py:55-92 — "A / B" dual candidacies
# fan out to one row per candidate; shorter split columns repeat their
# value; aligned i-th parts stay together.
_SPLIT_ORACLE = """
WITH src AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 5 = 0 THEN p_name || ' / ' || reverse(p_name)
              ELSE p_name END AS nm,
         CASE WHEN p_partkey % 10 = 0 THEN p_brand || ' / ' || lower(p_brand)
              ELSE p_brand END AS br
  FROM part
),
arrs AS (
  SELECT p_partkey, string_split(nm, ' / ') AS nma, string_split(br, ' / ') AS bra
  FROM src
),
fan AS (
  SELECT p_partkey, nma, bra,
         unnest(generate_series(1, greatest(len(nma), len(bra)))) AS candidacy
  FROM arrs
)
SELECT p_partkey, candidacy,
       COALESCE(nma[candidacy], nma[1]) AS candidate_name,
       COALESCE(bra[candidacy], bra[1]) AS party
FROM fan
"""


@register(
    "transform_split_candidacies",
    oracle=_SPLIT_ORACLE,
    doc="dual-candidacy explode: aligned multi-column split, repeat-first"
        " for shorter columns, candidacy index",
)
def transform_split_candidacies(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    src = part.select(
        "p_partkey",
        F.when(
            F.col("p_partkey") % 5 == 0,
            F.concat(F.col("p_name"), F.lit(" / "), F.reverse(F.col("p_name"))),
        ).otherwise(F.col("p_name")).alias("nm"),
        F.when(
            F.col("p_partkey") % 10 == 0,
            F.concat(F.col("p_brand"), F.lit(" / "), F.lower(F.col("p_brand"))),
        ).otherwise(F.col("p_brand")).alias("br"),
    )
    return split_multi_candidate(src, ["nm", "br"]).select(
        "p_partkey",
        "candidacy",
        F.col("nm").alias("candidate_name"),
        F.col("br").alias("party"),
    )


# ---------------------------------------------------------------------------
# F5 with the VERBATIM reference dictionaries (normalize.py): party codes
# through the literal-MAP path, office names through the broadcast-join
# path; unmapped values pass through both. The oracle's VALUES tables are
# generated from the same dicts, so any key/value drift fails the gate.
# Reference: votervoice/transform.py:7-10; national/_1034/transform.py:9-52.
# ---------------------------------------------------------------------------

from sig_etl_spark.functions.normalize import (  # noqa: E402
    OFFICE_MAP,
    PARTY_MAP,
    normalize_party,
    normalize_via_join,
)

_PARTY_RAW = ["D", "R", "DFL", "Whig", "?", "IND. R", "NPA", "Socialist"]
_OFFICE_RAW = ["US House", "House", "Governor", "Lt. Governor",
               "State Treasurer", "Mayor"]


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values_table(mapping: dict[str, str]) -> str:
    return ",".join(f"({_sql_quote(k)},{_sql_quote(v)})" for k, v in mapping.items())


def _sql_array(vals: list[str]) -> str:
    return "[" + ",".join(_sql_quote(v) for v in vals) + "]"


_NORMALIZE_ORACLE = f"""
WITH src AS (
  SELECT c_custkey,
         ({_sql_array(_PARTY_RAW)})[CAST(c_custkey % {len(_PARTY_RAW)} AS INTEGER) + 1] AS party_raw,
         ({_sql_array(_OFFICE_RAW)})[CAST(c_custkey % {len(_OFFICE_RAW)} AS INTEGER) + 1] AS office_raw
  FROM customer
),
pm(k, v) AS (VALUES {_values_table(PARTY_MAP)}),
om(k, v) AS (VALUES {_values_table(OFFICE_MAP)})
SELECT c_custkey, party_raw,
       COALESCE(pm.v, party_raw) AS party,
       office_raw,
       COALESCE(om.v, office_raw) AS office
FROM src
LEFT JOIN pm ON party_raw = pm.k
LEFT JOIN om ON office_raw = om.k
"""


@register(
    "f_normalize_dictionaries",
    oracle=_NORMALIZE_ORACLE,
    doc="F5 verbatim reference dictionaries: literal-MAP party + broadcast-join office",
)
def f_normalize_dictionaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    src = cust.select(
        "c_custkey",
        F.element_at(
            F.array(*[F.lit(v) for v in _PARTY_RAW]),
            (F.col("c_custkey") % len(_PARTY_RAW)).cast("int") + 1,
        ).alias("party_raw"),
        F.element_at(
            F.array(*[F.lit(v) for v in _OFFICE_RAW]),
            (F.col("c_custkey") % len(_OFFICE_RAW)).cast("int") + 1,
        ).alias("office_raw"),
    )
    out = src.withColumn("party", normalize_party(F.col("party_raw")))
    out = out.withColumn("office", F.col("office_raw"))
    out = normalize_via_join(out, "office", OFFICE_MAP)
    return out.select("c_custkey", "party_raw", "party", "office_raw", "office")
