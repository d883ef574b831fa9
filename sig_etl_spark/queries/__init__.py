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

# Related review discipline the lint cannot prove mechanically: integer
# division (Spark `div`, DuckDB `//`) is only VERSION-stable for
# NON-NEGATIVE operands. This sandbox's DuckDB 1.0.0 truncates `//`
# toward zero (probed: -7//2 = -3, matching Spark div), but later DuckDB
# releases changed `//` to floor semantics — exactly the class of
# driver-environment version seam the diag_seam bisector hunts. Every
# registered div site must therefore either divide a by-construction
# non-negative value (counts, cents, masses, rates — audited round 7) or
# divide the absolute value and re-sign (llm_langid_agreement's kappa).

# Oracle-side banned constructs, matched as CALL SITES: the lookbehind
# keeps identifiers that merely end in "median"/"power" (column or CTE
# names) from matching, while real calls still do. quantile_cont is a
# bare name (DuckDB-only spelling), so a substring match is exact.
_ORACLE_SEAM_RES = (
    r"(?i)(?<![_a-zA-Z0-9])power\(",
    r"quantile_cont",
    r"(?i)(?<![_a-zA-Z0-9])median\(",
)
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
    import re as _re

    problems: list[str] = []
    for name, rq in QUERIES.items():
        if name in _SEAM_WHITELIST:
            continue
        if rq.oracle:
            for pat in _ORACLE_SEAM_RES:
                if _re.search(pat, rq.oracle):
                    problems.append(f"{name}: oracle matches {pat!r}")
        try:
            src = inspect.getsource(rq.builder)
        except (OSError, TypeError):
            continue

        for pat in _BUILDER_SEAM_RES:
            # RAW lines, comments included: a banned construct inside an
            # F.expr string that happens to follow a '#' (e.g. a SQL
            # fragment containing '#') must not escape the lint. The cost
            # is that a comment NAMING a banned construct also trips it —
            # acceptable: describe the construct in prose instead.
            for line in src.splitlines():
                if _re.search(pat, line) and "percentile_disc" not in line and (
                    "percentile_approx" not in line
                ):
                    problems.append(f"{name}: builder contains {pat!r}: {line.strip()[:80]}")
    return problems


def _load_all() -> None:
    # Import for side effect: each module registers its queries. Import
    # order no longer determines driver coverage — _PRIORITY / _reorder()
    # below do (see the rotation policy there).
    from sig_etl_spark.queries import diag_demo  # noqa: F401
    from sig_etl_spark.queries import diag_seam  # noqa: F401
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
    from sig_etl_spark.queries import tpch_more  # noqa: F401
    from sig_etl_spark.queries import graph_demo  # noqa: F401
    from sig_etl_spark.queries import geo_demo  # noqa: F401


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
# behind at most N - C fresher-than-it entries. Round 14 (N=245, D=0):
# ceil(195/50) = 4 rounds worst-case — no hand-listed debuts, so the
# stale block drains at FULL width; the budget assert bounds how much a
# debut-heavy round can slow the refresh.
# Late-round _HOLDBACK entries sort last and only tighten this bound
# for everyone else.
# Round-14 drain arithmetic (VERDICT r13 task 4): the stalest cohort is
# now the 43-entry r9 block (the flagship, the S2-S5 extract family,
# most F-ops). Rank-0 newcomers (never driver-green — round 14 adds
# jdbc_stage_roundtrip, the S12 evidence closer, and
# llm_embedding_near_dup_ivf2, the linearized-assignment near-dup) sort
# ahead of it, so the 50 slots hold: newcomers + the ENTIRE r9 block +
# the oldest r10 entries, provided newcomers stay <= 7 (50 - 43). After round 14 no
# query's last driver row predates r10, max union staleness 4 rounds;
# tests/test_rotation_policy.py pins the sample composition.
# tools/verify_local.py
# still checks ALL queries locally every round, so the cap only limits
# the external signal, never the verification itself.
# ---------------------------------------------------------------------------

_DRIVER_CAP = 50
_DEBUT_BUDGET = 25

# Round 13 debuts — none hand-listed: the round's NEW registrations
# enter as rank-0 newcomers automatically, and the round's
# result-preserving change (the WRatio whitespace-only cutoff-bound fix
# — gate-equivalent by property + regression test, golden fixtures
# unchanged) alters no registered query's output, so the full 50-slot
# width goes to the r8-cohort drain.
_DEBUTS: list[str] = []

# Queries registered AFTER a round's debut budget was already spent
# (late-round additions) sort LAST that round, yielding their slot to
# the stale-block drain. Round 13: EMPTY so far.
_HOLDBACK: list[str] = []

# Round 8's _DIVERGENT_PROBES mechanism (expected-red probes yield their
# slot after one driver observation) is GONE: the only such probe pair
# (diag_seam_hugeint_raw/_cast) was deregistered in round 9 after its
# CORRECTNESS_r08 observation — the pair remains a pytest fixture
# (queries/diag_seam.py PROBE_QUERIES, tests/test_dtype_seam.py). The
# registry now contains zero expected-red rows by construction.


def _reorder() -> None:
    from sig_etl_spark.queries._driver_history import DRIVER_LAST_GREEN

    assert len(_DEBUTS) <= _DEBUT_BUDGET, (
        f"debut list ({len(_DEBUTS)}) exceeds budget {_DEBUT_BUDGET}: "
        "the stale block would starve — split across rounds instead"
    )
    missing = [n for n in _DEBUTS if n not in QUERIES]
    if missing:  # a renamed/removed query must fail loudly, not silently
        raise RuntimeError(f"_DEBUTS names not in registry: {missing}")
    missing_hb = [n for n in _HOLDBACK if n not in QUERIES]
    if missing_hb:
        raise RuntimeError(f"_HOLDBACK names not in registry: {missing_hb}")
    overlap = set(_DEBUTS) & set(_HOLDBACK)
    if overlap:
        raise RuntimeError(f"_DEBUTS/_HOLDBACK overlap: {sorted(overlap)}")
    reg_index = {n: i for i, n in enumerate(QUERIES)}
    rest = sorted(
        (n for n in QUERIES if n not in _DEBUTS and n not in _HOLDBACK),
        key=lambda n: (DRIVER_LAST_GREEN.get(n, 0), reg_index[n]),
    )
    ordered = {n: QUERIES[n] for n in [*_DEBUTS, *rest, *_HOLDBACK]}
    QUERIES.clear()
    QUERIES.update(ordered)


_load_all()
_reorder()
