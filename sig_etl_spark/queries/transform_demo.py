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
