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


# ---------------------------------------------------------------------------
# FLOAT-SEAM LINT (round-6, prescribed by VERDICT r05 task 7): the three
# r05 driver hash-reds shared one root cause — ulp-sensitive float seams
# in driver-visible columns (JVM Math.pow vs libm POWER; Spark
# interpolated percentile() vs DuckDB quantile_cont midpoint
# arithmetic). This class of driver-only failure is mechanical to
# catch, so it is banned mechanically: registered oracles may not use
# POWER( / quantile_cont / median( (interpolating alias), and builder
# functions may not use F.pow( / interpolated percentile(. Discrete
# percentile_disc / quantile_disc (actual data elements, identical rank
# rule both engines — probed) and plain multiplication are the
# sanctioned replacements. The whitelist is EMPTY; adding a name
# requires a documented reason here.
# ---------------------------------------------------------------------------

_SEAM_WHITELIST: frozenset[str] = frozenset()

_ORACLE_SEAMS = ("POWER(", "power(", "quantile_cont", "median(", "MEDIAN(")
# builder-side: match real call sites — the lookbehind keeps identifiers
# that merely END in "percentile" (query/function names) from matching,
# while quoted SQL like F.expr("percentile(x, 0.5)") still does.
_BUILDER_SEAM_RES = (r"F\.pow\(", r"(?<![_a-zA-Z0-9])percentile\(")


def float_seam_lint() -> list[str]:
    """Return a list of lint violations (empty = clean).

    Scans every registered oracle string for cross-engine float-seam
    constructs and every builder function's source for their Spark-side
    twins. tools/verify_local.py fails on violations and
    tests/test_float_seam_lint.py locks the whitelist empty.
    """
    import inspect

    problems: list[str] = []
    for name, rq in QUERIES.items():
        if name in _SEAM_WHITELIST:
            continue
        if rq.oracle:
            for pat in _ORACLE_SEAMS:
                if pat in rq.oracle:
                    problems.append(f"{name}: oracle contains {pat!r}")
        try:
            src = inspect.getsource(rq.builder)
        except (OSError, TypeError):
            continue
        import re as _re

        for pat in _BUILDER_SEAM_RES:
            for line in src.splitlines():
                code = line.split("#", 1)[0]
                if _re.search(pat, code) and "percentile_disc" not in code and (
                    "percentile_approx" not in code
                ):
                    problems.append(f"{name}: builder contains {pat!r}: {code.strip()[:80]}")
    return problems


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
# DRIVER-ROW ROTATION POLICY (computed since round 6 — VERDICT r05 task
# 2): the driver's correctness gate records only the FIRST
# _DRIVER_CAP=50 registry entries each round, so the registry is
# reordered after loading:
#   (a) _DEBUTS — queries NEW this round or whose RESULTS changed this
#       round — come first: every fresh/changed query gets a
#       driver-visible row in the round it changes. Hand-listed, budget
#       asserted <= _DEBUT_BUDGET so slot (b) never starves.
#   (b) everything else, ordered by LAST DRIVER-GREEN ROUND ascending
#       (oldest-unverified first; never-green = round 0 sorts first),
#       ties broken by registration order. The per-query round comes
#       from _driver_history.DRIVER_LAST_GREEN, regenerated each round
#       from the driver's own CORRECTNESS_r*.json files by
#       tools/gen_driver_history.py — the ordering is COMPUTED from the
#       driver's record, not hand-maintained.
#
# Refresh guarantee (the honest, arithmetic one — round 5's "within two
# rounds" claim was impossible at cap 50 with 148 queries and is hereby
# retracted): with N registered queries, cap C=50 and debut budget D,
# a non-debut query waits at most ceil((N - C) / (C - D)) rounds after
# falling past the cap before regaining a driver row, because each round
# promotes the (C - D) stalest entries and a just-verified query re-enters
# behind at most N - C fresher-than-it entries. Round 6 (N=168, D=25):
# ceil(118/25) = 5 rounds worst-case — debut-heavy rounds slow the
# refresh; the budget assert bounds how much. tools/verify_local.py
# still checks ALL queries locally every round, so the cap only limits
# the external signal, never the verification itself.
# ---------------------------------------------------------------------------

_DRIVER_CAP = 50
_DEBUT_BUDGET = 25

# New or result-changed in round 6:
#   - the three r05 driver hash-reds, re-fixed seam-proof (d*d not pow;
#     discrete percentile_disc/quantile_disc boundaries/estimates);
#   - events_quantiles / events_anomaly_mad, converted from interpolated
#     percentile() to discrete percentile_disc by the float-seam lint
#     (their emitted doubles changed);
#   - round-6 debut queries appended as they land.
_DEBUTS = [
    "llm_source_drift",
    "orders_rfm_segmentation",
    "sketch_quantile_calibration",
    "events_quantiles",
    "events_anomaly_mad",
    "linkage_fuzzy_match_wratio_subblocked",
    "llm_corpus_curation_minhash",
    "llm_source_overlap_minhash",
    "llm_ngram_novelty",
    "llm_token_fluency",
    "sketch_hll_sliding_distinct",
    "j_q3_shipping_priority",
    "sketch_hll_retention",
    "llm_decontaminate_bloom",
    "dq_validation_report",
    "llm_incremental_dedup",
    "llm_embedding_dedup_clusters",
    "mm_shot_segments",
    "llm_compression_ratio",
    "j_q10_returned_items",
    "j_hierarchy_flatten",
    "w_revenue_percentile",
    "events_seasonal_forecast",
    "mm_audio_segments",
    "j_q18_large_orders",
]


def _reorder() -> None:
    from sig_etl_spark.queries._driver_history import DRIVER_LAST_GREEN

    assert len(_DEBUTS) <= _DEBUT_BUDGET, (
        f"debut list ({len(_DEBUTS)}) exceeds budget {_DEBUT_BUDGET}: "
        "the stale block would starve — split across rounds instead"
    )
    missing = [n for n in _DEBUTS if n not in QUERIES]
    if missing:  # a renamed/removed query must fail loudly, not silently
        raise RuntimeError(f"_DEBUTS names not in registry: {missing}")
    reg_index = {n: i for i, n in enumerate(QUERIES)}
    rest = sorted(
        (n for n in QUERIES if n not in _DEBUTS),
        key=lambda n: (DRIVER_LAST_GREEN.get(n, 0), reg_index[n]),
    )
    ordered = {n: QUERIES[n] for n in [*_DEBUTS, *rest]}
    QUERIES.clear()
    QUERIES.update(ordered)


_load_all()
_reorder()
