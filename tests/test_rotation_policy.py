"""Driver-row rotation policy invariants (VERDICT r05 task 2).

The driver records correctness rows for only the first 50 registry
entries. Since round 6 the ordering is COMPUTED: hand-listed debuts
first (budget-capped), then everything else by last driver-green round
ascending (from the generated _driver_history module). These tests lock
the arithmetic so the policy cannot silently regress into round 5's
broken hand-maintained list.
"""

from sig_etl_spark.queries import (
    _DEBUT_BUDGET,
    _DEBUTS,
    _DRIVER_CAP,
    _HOLDBACK,
    QUERIES,
)
from sig_etl_spark.queries._driver_history import DRIVER_LAST_GREEN


def test_debut_budget_respected():
    assert len(_DEBUTS) <= _DEBUT_BUDGET


def test_debuts_are_registered_and_first():
    names = list(QUERIES)
    assert names[: len(_DEBUTS)] == _DEBUTS


def test_holdback_is_registered_last_and_disjoint():
    """Late-round additions that yield their driver slot to the stale
    drain must sort at the very end of the registry and never overlap
    the debut list (a holdback with a debut slot is a contradiction)."""
    names = list(QUERIES)
    assert names[len(names) - len(_HOLDBACK):] == _HOLDBACK
    assert not set(_DEBUTS) & set(_HOLDBACK)
    # holdback is only meaningful for queries the driver has never seen —
    # a previously-green query parked here would silently rot instead
    assert all(n not in DRIVER_LAST_GREEN for n in _HOLDBACK), [
        n for n in _HOLDBACK if n in DRIVER_LAST_GREEN
    ]


def test_first_cap_holds_the_stalest_block():
    """No query outside the first 50 may be staler (older last-green
    round) than any non-debut query inside it — i.e. the cap's non-debut
    slots really do go to the oldest-unverified entries. _HOLDBACK names
    are exempt: they are never-green by construction and deliberately
    yield their slot to the drain."""
    names = list(QUERIES)
    inside = [n for n in names[:_DRIVER_CAP] if n not in _DEBUTS]
    outside = [n for n in names[_DRIVER_CAP:] if n not in _HOLDBACK]
    if not inside or not outside:
        return
    worst_inside = max(DRIVER_LAST_GREEN.get(n, 0) for n in inside)
    best_outside = min(DRIVER_LAST_GREEN.get(n, 0) for n in outside)
    assert worst_inside <= best_outside, (worst_inside, best_outside)


def test_history_names_are_current_or_documented():
    """Entries in the generated history that no longer exist in the
    registry must be known renames — catches a rename that would
    silently reset a query's rotation age."""
    known_gone = {
        # renamed/superseded before round 6; their successors have their
        # own rows
        "llm_ann_recall_kmeans",
        # the hugeint probe pair was DEREGISTERED in round 9 after its
        # one CORRECTNESS_r08 observation (VERDICT r8 task 2) — pytest
        # fixtures now (queries/diag_seam.py PROBE_QUERIES)
        "diag_seam_hugeint_cast",
        "diag_seam_hugeint_raw",
    }
    gone = {n for n in DRIVER_LAST_GREEN if n not in QUERIES} - known_gone
    assert not gone, gone


def test_worked_example_comment_matches_live_registry():
    """The policy comment's worked example (Round N (N=…, D=…):
    ceil(…/…)) must be computed from the LIVE registry — a stale example
    in the very comment that exists to correct round 5's wrong refresh
    claim defeats its purpose."""
    import math
    import re

    import sig_etl_spark.queries as q

    src = open(q.__file__).read()
    m = re.search(
        r"\(N=(\d+), D=(\d+)\):\s*#?\s*ceil\((\d+)/(\d+)\) = (\d+) rounds",
        src,
    )
    assert m, "worked example not found in rotation policy comment"
    n, d, num, den, worst = map(int, m.groups())
    assert n == len(q.QUERIES), (n, len(q.QUERIES))
    assert d == len(q._DEBUTS), (d, len(q._DEBUTS))
    assert num == n - q._DRIVER_CAP
    assert den == q._DRIVER_CAP - d
    assert worst == math.ceil(num / den)


def test_contrast_rows_name_registered_twins():
    """Every deliberately-slow demo row (VERDICT r7 task 6) must label
    itself 'CONTRAST ROW' and name a REGISTERED production twin, so a
    bench reader or the driver can't mistake it for a production path."""
    import re

    expected = {
        "linkage_fuzzy_match_skew",
        "linkage_fuzzy_match_wratio",
        "llm_simhash_pairs",
        "llm_ngram_jaccard",
        "llm_dedup_clusters",
        "llm_corpus_curation",
        # round 13 (VERDICT r12 task 2): the exact all-pairs-within-label
        # embedding arm, labeled against its IVF twin
        "llm_embedding_near_dup",
    }
    found = {n for n, rq in QUERIES.items() if "CONTRAST ROW" in rq.doc}
    assert found == expected, found ^ expected
    for name in found:
        m = re.search(r"production twin:\s*([a-z0-9_\s]+?)[.,]", QUERIES[name].doc)
        assert m, f"{name}: no 'production twin: <name>' in doc"
        twin = re.sub(r"\s+", "", m.group(1))
        assert twin in QUERIES, f"{name}: twin {twin!r} not registered"
        assert twin != name


def test_no_expected_red_rows_registered():
    """Round 9 (VERDICT r8 task 2): the registry must contain ZERO
    expected-red rows — the hugeint probe pair is a pytest fixture
    (queries/diag_seam.py PROBE_QUERIES), not a registered query, so
    "all driver rows green" is statable without a footnote."""
    from tools.dtype_seam_scan import EXPECTED_DIVERGENT

    assert not (EXPECTED_DIVERGENT & set(QUERIES)), (
        "expected-divergent probes must not be registered"
    )
    assert "diag_seam_hugeint_raw" not in QUERIES
    assert "diag_seam_hugeint_cast" not in QUERIES


def test_stale_block_drains_round14():
    """VERDICT r13 task 4 (the drain pin, advanced one round): the r14
    driver sample (first 50 registry entries) must absorb the ENTIRE
    43-entry r9-stale cohort (the flagship, the S2-S5 extract family,
    most F-ops) plus rank-0 newcomers and the oldest r10 entries. Every
    non-debut entry inside the cap must have last-green <= r10, no
    r9-or-older entry may be left outside the cap, and newcomers must
    stay <= 7 so the 50 slots cover the whole r9 block."""
    import sig_etl_spark.queries as q
    from sig_etl_spark.queries._driver_history import DRIVER_LAST_GREEN

    cap = list(QUERIES)[: q._DRIVER_CAP]
    non_debut = [n for n in cap if n not in q._DEBUTS]
    assert len(non_debut) >= q._DRIVER_CAP - q._DEBUT_BUDGET
    worst = max(DRIVER_LAST_GREEN.get(n, 0) for n in non_debut)
    assert worst <= 10, (
        f"a fresher-than-r10 entry leads the stale block: "
        f"{[(n, DRIVER_LAST_GREEN.get(n, 0)) for n in non_debut if DRIVER_LAST_GREEN.get(n, 0) > 10]}"
    )
    r9_outside = [
        n
        for n in list(QUERIES)[q._DRIVER_CAP:]
        if 0 < DRIVER_LAST_GREEN.get(n, 0) <= 9
    ]
    assert not r9_outside, f"r9-stale entries left outside the cap: {r9_outside}"
    newcomers = [n for n in QUERIES if n not in DRIVER_LAST_GREEN]
    assert len(newcomers) <= 7, (
        f"too many rank-0 newcomers for the r9 drain: {newcomers}"
    )
