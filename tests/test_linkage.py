"""Property tests for the fuzzy blocked record linkage (SURVEY §5.4):
exact-duplicate scores 100, blocking invariant, threshold monotonicity,
duplicate-review flag, empty-column policy, multi-source alternates."""

from __future__ import annotations

import pytest

from sig_etl_spark.linkage import ColumnRule, MatchConfig, fuzzy_match, match_stats
from sig_etl_spark.linkage.scorers import (
    py_partial_ratio,
    py_ratio,
    py_token_sort_ratio,
    py_wratio,
)


def _x(spark, rows):
    return spark.createDataFrame(rows, ["x_id", "state", "first", "last"])


def _y(spark, rows):
    return spark.createDataFrame(rows, ["y_id", "state", "y_first", "y_last", "y_nick"])


def _cfg(**kw):
    base = dict(
        rules=(
            ColumnRule("first", ("y_first", "y_nick"), scorer="levenshtein", threshold=85.0),
            ColumnRule("last", ("y_last",), scorer="levenshtein", threshold=88.0),
        ),
        block_on=("state",),
        y_id="y_id",
        required_threshold=85.0,
        duplicate_threshold=3.0,
    )
    base.update(kw)
    return MatchConfig(**base)


def test_exact_duplicate_scores_100(spark):
    x = _x(spark, [(1, "TX", "john", "smith")])
    y = _y(spark, [(10, "TX", "john", "smith", "")])
    row = fuzzy_match(x, y, _cfg()).first()
    assert row.candidate_id == 10
    assert row.match_score == 100.0
    assert row.match_status == "matched"


def test_blocking_invariant_no_cross_state(spark):
    x = _x(spark, [(1, "TX", "john", "smith")])
    y = _y(spark, [(10, "CA", "john", "smith", "")])  # identical but wrong block
    row = fuzzy_match(x, y, _cfg()).first()
    assert row.candidate_id is None
    assert row.match_status == "unmatched"


def test_threshold_monotonicity(spark):
    x = _x(spark, [(1, "TX", "jon", "smith")])  # 1 edit in first name
    y = _y(spark, [(10, "TX", "john", "smith", "")])
    # first name scores 75 -> gated 0 by its 85 column threshold, so
    # combined = (0 + 100)/2 = 50: clears required=50, fails required=95
    lo = fuzzy_match(x, y, _cfg(required_threshold=50.0)).first()
    hi = fuzzy_match(x, y, _cfg(required_threshold=95.0)).first()
    assert lo.candidate_id == 10
    assert hi.candidate_id is None and hi.match_status == "unmatched"


def test_duplicate_review_flag(spark):
    x = _x(spark, [(1, "TX", "john", "smith")])
    y = _y(
        spark,
        [
            (10, "TX", "john", "smith", ""),
            (11, "TX", "john", "smith", ""),  # near-tie duplicate
            (12, "TX", "zzz", "qqq", ""),
        ],
    )
    row = fuzzy_match(x, y, _cfg()).first()
    assert row.match_status == "review"
    assert row.candidate_id == 10  # deterministic tiebreak: lowest y_id
    assert row.n_candidates == 2


def test_empty_x_column_drops_out(spark):
    # last name empty: rule must not zero the combined score
    x = _x(spark, [(1, "TX", "john", "")])
    y = _y(spark, [(10, "TX", "john", "smith", "")])
    row = fuzzy_match(x, y, _cfg()).first()
    assert row.match_score == 100.0
    assert row.match_status == "matched"


def test_multi_source_alternate_nickname(spark):
    # first name only matches the nickname column
    x = _x(spark, [(1, "TX", "bob", "smith")])
    y = _y(spark, [(10, "TX", "robert", "smith", "bob")])
    row = fuzzy_match(x, y, _cfg()).first()
    assert row.candidate_id == 10
    assert row.match_score == 100.0


def test_unblocked_x_survives(spark):
    # x block key with no y partner -> left-join survival as unmatched
    x = _x(spark, [(1, "WY", "john", "smith")])
    y = _y(spark, [(10, "TX", "john", "smith", "")])
    out = fuzzy_match(x, y, _cfg()).collect()
    assert len(out) == 1 and out[0].match_status == "unmatched"


def test_salting_preserves_results(spark):
    x = _x(spark, [(1, "TX", "john", "smith"), (2, "TX", "jane", "doe"),
                   (3, "CA", "bob", "li"), (4, "CA", "amy", "wu")])
    y = _y(spark, [(10, "TX", "john", "smith", ""), (11, "TX", "jane", "doe", ""),
                   (12, "CA", "bob", "li", ""), (13, "CA", "zoe", "xu", "")])
    plain = fuzzy_match(x, y, _cfg()).collect()
    salted = fuzzy_match(x, y, _cfg(salt_buckets=4)).collect()
    key = lambda rows: {  # noqa: E731
        r.x_id: (r.candidate_id, r.match_score, r.match_status) for r in rows
    }
    assert key(plain) == key(salted)


def test_match_stats(spark):
    x = _x(spark, [(1, "TX", "john", "smith"), (2, "TX", "zz", "yy")])
    y = _y(spark, [(10, "TX", "john", "smith", "")])
    stats = {r.match_status: r.n for r in match_stats(fuzzy_match(x, y, _cfg())).collect()}
    assert stats == {"matched": 1, "unmatched": 1}


def test_batch_ratio_matches_pairwise():
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from sig_etl_spark.linkage.scorers import batch_ratio

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.text(max_size=12), st.text(max_size=12)),
            min_size=1,
            max_size=8,
        )
    )
    def check(pairs):
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        got = batch_ratio(a, b)
        want = [py_ratio(x, y) for x, y in pairs]
        assert np.allclose(got, want), (pairs, list(got), want)

    check()


def test_batch_score_cutoff_keeps_whitespace_only_pairs():
    """Regression: whitespace-only, length-skewed pairs token-sort to
    ('', '') whose ratio is 100 by convention, so the true WRatio is 95.
    The cutoff length bound must not prune them (it once returned ts_ub=0
    for lta+ltb == 0, silently dropping true matches the JVM mask kept)."""
    import pandas as pd
    import pytest

    from sig_etl_spark.linkage.scorers import _batch_score

    a = pd.Series([" ", " ", "\t"])
    b = pd.Series(["   ", " " * 8, "\t\t\t\t"])
    for gate in (85.0, 92.0, 95.0):
        got = list(_batch_score("wratio", a, b, cutoff=gate))
        assert got == pytest.approx([95.0, 95.0, 95.0]), (gate, got)


def test_batch_score_cutoff_gate_equivalent():
    """_batch_score(wratio, cutoff=g) must return the TRUE score for every
    pair whose true score >= g, and 0-or-true below — randomized pairs
    incl. empties, unicode whitespace, and length-skewed strings."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from sig_etl_spark.linkage.scorers import _batch_score

    words = st.text(alphabet="abc   xyz", max_size=30)

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(st.tuples(words, words), min_size=1, max_size=8),
        st.floats(min_value=1.0, max_value=100.0),
    )
    def check(pairs, gate):
        a = pd.Series([p[0] for p in pairs])
        b = pd.Series([p[1] for p in pairs])
        got = list(_batch_score("wratio", a, b, cutoff=gate))
        for (x, y), g in zip(pairs, got):
            true = py_wratio(x, y)
            if true >= gate:
                assert g == pytest.approx(true, abs=1e-9), (x, y, gate)
            else:
                assert g == pytest.approx(true, abs=1e-9) or g == 0.0, (x, y, gate)

    check()


def test_wratio_jvm_prefilter_gate_equivalent(spark):
    """score_column('wratio', gate=g) with the banded-levenshtein JVM
    mask must equal the unmasked UDF wherever the true score clears the
    gate, and be 0-or-true below it — through a real Spark plan, over
    pairs spanning near-duplicates, unicode whitespace (the Python-split
    seam the enumerated _PY_WS_CLASS exists for), token permutations
    (the 0.95 ts arm), and >1.5x length skew (the partial-cap arm)."""
    import random

    from pyspark.sql import functions as F

    from sig_etl_spark.linkage.scorers import (
        make_pandas_scorer,
        py_wratio,
        score_column,
    )

    rng = random.Random(12)
    alphabet = "abcdefgh   "
    pairs = [
        ("john smith", "smith, john"),
        ("john smith", "john smith"),
        ("abcdefgh", "abcdefghx"),
        ("ab", "abcdefghabcdefgh"),  # ratio_len 8 boundary
        ("", "x"),
        ("", ""),
        ("a b c", "c b a"),
    ] + [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24))),
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24))),
        )
        for _ in range(300)
    ]
    gate = 85.0
    df = spark.createDataFrame(pairs, "a string, b string")
    out = df.select(
        "a",
        "b",
        score_column("wratio", F.col("a"), F.col("b"), gate=gate).alias("masked"),
        make_pandas_scorer("wratio")(F.col("a"), F.col("b")).alias("raw"),
    ).collect()
    assert len(out) == len(pairs)
    pruned = 0
    for r in out:
        true = py_wratio(r.a, r.b)
        assert r.raw == pytest.approx(true, abs=1e-9), (r.a, r.b)
        if true >= gate:
            assert r.masked == pytest.approx(true, abs=1e-9), (r.a, r.b)
        else:
            assert r.masked == pytest.approx(true, abs=1e-9) or r.masked == 0.0
            pruned += r.masked == 0.0 and true > 0.0
    assert pruned > 50, "prefilter pruned almost nothing on random pairs"


def test_batch_scorers_match_pairwise():
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from sig_etl_spark.linkage.scorers import _batch_score

    words = st.text(alphabet="ab c", max_size=14)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(words, words), min_size=1, max_size=6))
    def check(pairs):
        a = pd.Series([p[0] for p in pairs])
        b = pd.Series([p[1] for p in pairs])
        for name, ref in [
            ("wratio", py_wratio),
            ("partial_ratio", py_partial_ratio),
            ("token_sort_ratio", py_token_sort_ratio),
        ]:
            got = _batch_score(name, a, b)
            want = [ref(x, y) for x, y in pairs]
            assert np.allclose(got, want), (name, pairs, list(got), want)

    check()


def test_python_scorers_definitions():
    assert py_ratio("abc", "abc") == 100.0
    assert py_ratio("", "") == 100.0
    assert py_ratio("abcd", "abce") == 75.0  # indel: dist 2 of total 8
    assert py_partial_ratio("abc", "xxabcxx") == 100.0
    assert py_token_sort_ratio("smith john", "john smith") == 100.0
    assert py_wratio("john smith", "smith, john") > 90.0
    assert py_wratio("", "x") == 0.0


def test_shared_column_names_resolve(spark):
    """The reference's canonical shape: x and y BOTH carry firstname/
    lastname (votervoice/match.py:56-66 scores firstname vs firstname).
    Bare column refs after the join used to raise AMBIGUOUS_REFERENCE."""
    x = spark.createDataFrame(
        [(1, "TX", "john", "smith"), (2, "TX", "mary", "jones")],
        ["x_id", "state", "firstname", "lastname"],
    )
    y = spark.createDataFrame(
        [(10, "TX", "john", "smith", "jack"), (11, "TX", "peter", "brown", "")],
        ["y_id", "state", "firstname", "lastname", "nickname"],
    )
    cfg = MatchConfig(
        rules=(
            ColumnRule("firstname", ("firstname", "nickname"), scorer="levenshtein", threshold=85.0),
            ColumnRule("lastname", ("lastname",), scorer="levenshtein", threshold=88.0),
        ),
        block_on=("state",),
        y_id="y_id",
        required_threshold=85.0,
    )
    rows = {r.x_id: r for r in fuzzy_match(x, y, cfg).collect()}
    assert rows[1].candidate_id == 10
    assert rows[1].match_score == 100.0
    assert rows[1].match_status == "matched"
    assert rows[2].candidate_id is None
    assert rows[2].match_status == "unmatched"
    # x's own firstname column passes through untouched
    assert rows[1].firstname == "john"


# --- Golden-value parity lock for the pure-Python scorer tier -------------
# Hand-verified against the rapidfuzz indel definitions (the lib itself is
# not in this container): ratio = 100*(1 - indel/(len(a)+len(b))) with
# indel = len(a)+len(b)-2*LCS; partial = best window; token_sort = ratio
# over space-sorted tokens; wratio = the weighted combination implemented
# in scorers.py (0.95 token boost, 0.9/0.6 partial scaling). Spot checks:
# kitten/sitting LCS=4 -> 61.538462; smith/smyth LCS=4 -> 80; JOHN/john is
# case-sensitive -> 0; WRatio("","") = 0 per rapidfuzz.
_GOLDEN = [
    # a, b, ratio, partial, token_sort, partial_token, wratio
    ("", "", 100.0, 100.0, 100.0, 100.0, 0.0),
    ("abc", "abc", 100.0, 100.0, 100.0, 100.0, 100.0),
    ("abc", "abd", 66.666667, 66.666667, 66.666667, 66.666667, 66.666667),
    ("abcd", "bcda", 75.0, 75.0, 75.0, 75.0, 75.0),
    ("kitten", "sitting", 61.538462, 66.666667, 61.538462, 66.666667, 61.538462),
    ("john", "jon", 85.714286, 66.666667, 85.714286, 66.666667, 85.714286),
    ("john smith", "smith john", 50.0, 50.0, 100.0, 100.0, 95.0),
    ("new york mets", "mets new york", 61.538462, 61.538462, 100.0, 100.0, 95.0),
    ("mary q public", "public, mary q", 44.444444, 46.153846, 96.296296, 92.307692, 91.481481),
    ("robert", "bob", 44.444444, 66.666667, 44.444444, 66.666667, 60.0),
    ("elizabeth warren", "liz warren", 76.923077, 70.0, 76.923077, 70.0, 76.923077),
    ("JOHN", "john", 0.0, 0.0, 0.0, 0.0, 0.0),
    ("a", "b", 0.0, 0.0, 0.0, 0.0, 0.0),
    ("ab", "", 0.0, 0.0, 0.0, 0.0, 0.0),
    ("van der berg", "vandenberg", 81.818182, 70.0, 36.363636, 70.0, 81.818182),
    ("smith", "smyth", 80.0, 80.0, 80.0, 80.0, 80.0),
    ("o'brien", "obrien", 92.307692, 83.333333, 92.307692, 83.333333, 92.307692),
    ("washington", "washingtno", 90.0, 90.0, 90.0, 90.0, 90.0),
    ("this is a test", "this is a test!", 96.551724, 100.0, 96.551724, 100.0, 96.551724),
    ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 90.909091, 90.909091, 100.0, 100.0, 95.0),
    # --- length-ratio seams (the scale switch points rapidfuzz treats
    # specially: partial kicks in above 1.5, its scale drops 0.9 -> 0.6 at
    # 8). Hand-computed: ratio = 200*LCS/(la+lb); the short side is an
    # exact prefix of the long side so every partial window score is 100.
    ("abcdef", "abcd", 80.0, 100.0, 80.0, 100.0, 80.0),          # 6/4 = 1.5 exactly: plain branch, partial NOT consulted
    ("abcdefg", "abcd", 72.727273, 100.0, 72.727273, 100.0, 90.0),  # 7/4 = 1.75: partial*0.9 wins
    ("abxxxxxxxxxxxxx", "ab", 23.529412, 100.0, 23.529412, 100.0, 90.0),   # 15/2 = 7.5: still 0.9
    ("abxxxxxxxxxxxxxx", "ab", 22.222222, 100.0, 22.222222, 100.0, 60.0),  # 16/2 = 8 exactly: scale drops to 0.6
    ("abxxxxxxxxxxxxxxxx", "ab", 20.0, 100.0, 20.0, 100.0, 60.0),          # 18/2 = 9: 0.6 branch proper
]


@pytest.mark.parametrize("a,b,ratio,partial,tsort,ptoken,wratio", _GOLDEN)
def test_scorer_golden_values(a, b, ratio, partial, tsort, ptoken, wratio):
    from sig_etl_spark.linkage.scorers import (
        py_partial_ratio,
        py_partial_token_ratio,
        py_ratio,
        py_token_sort_ratio,
        py_wratio,
    )

    assert py_ratio(a, b) == pytest.approx(ratio, abs=1e-6)
    assert py_partial_ratio(a, b) == pytest.approx(partial, abs=1e-6)
    assert py_token_sort_ratio(a, b) == pytest.approx(tsort, abs=1e-6)
    assert py_partial_token_ratio(a, b) == pytest.approx(ptoken, abs=1e-6)
    assert py_wratio(a, b) == pytest.approx(wratio, abs=1e-6)


def test_vectorized_batch_matches_golden():
    """The numpy batch tier must agree with the scalar tier everywhere."""
    import pandas as pd

    from sig_etl_spark.linkage.scorers import _batch_score, py_ratio, py_wratio

    a = pd.Series([c[0] for c in _GOLDEN])
    b = pd.Series([c[1] for c in _GOLDEN])
    got_ratio = _batch_score("ratio", a, b)
    got_wratio = _batch_score("wratio", a, b)
    for i, (x, y, *_rest) in enumerate(_GOLDEN):
        assert got_ratio[i] == pytest.approx(py_ratio(x, y), abs=1e-6)
        assert got_wratio[i] == pytest.approx(py_wratio(x, y), abs=1e-6)


def test_skewed_fixture_salted_equivalence(spark):
    """tests/fixtures/skewed_linkage_{x,y}.csv: a deliberately skewed
    block map (block 0 = 52% of rows, the CA/TX shape). Salted and
    unsalted runs must produce identical results under the shuffle-join
    regime, and the fixture must actually BE skewed."""
    import dataclasses
    import os

    from pyspark.sql import functions as F

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    y = spark.read.csv(
        os.path.join(fixtures, "skewed_linkage_y.csv"),
        header=True,
        schema="y_id long, blk int, y_name string, y_city string",
    )
    x = spark.read.csv(
        os.path.join(fixtures, "skewed_linkage_x.csv"),
        header=True,
        schema="x_id long, blk int, x_name string, x_city string",
    )
    hot = y.filter(F.col("blk") == 0).count() / y.count()
    assert hot >= 0.4, f"fixture lost its skew (hot share {hot:.2f})"

    cfg = MatchConfig(
        rules=(
            ColumnRule("x_name", ("y_name",), scorer="levenshtein", threshold=85.0),
            ColumnRule("x_city", ("y_city",), scorer="exact", threshold=100.0),
        ),
        block_on=("blk",),
        y_id="y_id",
        required_threshold=80.0,
        duplicate_threshold=3.0,
        shuffle_join=True,
    )

    def run(salt):
        out = fuzzy_match(x, y, dataclasses.replace(cfg, salt_buckets=salt))
        return sorted(
            (r.x_id, r.candidate_id, r.match_score, r.n_candidates, r.match_status)
            for r in out.collect()
        )

    unsalted = run(0)
    assert len(unsalted) == x.count()  # every x row survives
    assert unsalted == run(8), "salting changed linkage results on skew"
    statuses = {s for *_rest, s in unsalted}
    assert "matched" in statuses


def test_subblocked_preserves_matches(spark, sf_dir):
    """The secondary name-initial block must not lose any match the
    block-only matcher finds: the skew fixture's perturbation (trailing
    typo) preserves the initial, so every true pair survives the cut —
    and each x row searches no more candidates than before."""
    from sig_etl_spark.queries import QUERIES

    full = QUERIES["linkage_fuzzy_match_skew"].builder(spark, sf_dir).collect()
    sub = QUERIES["linkage_fuzzy_match_subblocked"].builder(spark, sf_dir).collect()
    fm = {r["x_id"]: r["candidate_id"] for r in full if r["match_status"] == "matched"}
    sm = {r["x_id"]: r["candidate_id"] for r in sub if r["match_status"] == "matched"}
    assert fm, "skew fixture produced no matches"
    for x_id, cand in fm.items():
        assert sm.get(x_id) == cand, (x_id, cand, sm.get(x_id))
    fc = {r["x_id"]: r["n_candidates"] for r in full}
    sc = {r["x_id"]: r["n_candidates"] for r in sub}
    assert all(sc[x] <= fc[x] for x in sc)


def test_subblocked_salted_identical_to_subblocked(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES

    a = QUERIES["linkage_fuzzy_match_subblocked"].builder(spark, sf_dir)
    b = QUERIES["linkage_fuzzy_match_subblocked_salted"].builder(spark, sf_dir)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_production_preset_plan_shape(spark):
    """MatchConfig.production (round 14 — VERDICT r13 task 6) must
    produce THE scale-safe plan without the caller hand-assembling it:
    (a) the join carries the derived _sub_block secondary key, (b) every
    levenshtein rule scores through the BANDED 3-arg distance (the
    gate-equivalent Ukkonen cut), and (c) the shuffle-join regime salts
    4-way by default while the broadcast regime does not."""
    cfg = MatchConfig.production(
        rules=(
            ColumnRule("first", ("y_first", "y_nick"), threshold=85.0),
            ColumnRule("last", ("y_last",), threshold=88.0),
        ),
        block_on=("state",),
        shuffle_join=True,
    )
    assert cfg.sub_block == ("first", "y_first", 1)
    assert cfg.salt_buckets == 4
    assert MatchConfig.production(
        rules=(ColumnRule("first", ("y_first",), threshold=85.0),),
        block_on=("state",),
        broadcast_y=True,
    ).salt_buckets == 0
    x = _x(spark, [(1, "TX", "john", "smith")])
    y = _y(spark, [(10, "TX", "john", "smith", "")])
    out = fuzzy_match(x, y, cfg)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_sub_block" in plan, "secondary blocking key missing from plan"
    assert "_salt" in plan, "salting missing from the shuffle-join preset"
    import re

    # banded tier: Spark's 3-arg levenshtein(a, b, threshold) renders
    # its band argument as Some(cast(CEIL(...))) in the logical plan —
    # the 2-arg full-DP spelling carries no third argument
    assert re.search(r"levenshtein\([^\n]*Some\(cast\(CEIL", plan), (
        "banded 3-arg levenshtein not in plan"
    )
    # and the preset's matches are the same as the hand-built config's
    got = {r.x_id: (r.candidate_id, r.match_status) for r in out.collect()}
    assert got == {1: (10, "matched")}


def test_production_preset_sub_block_blocks_on_initial(spark):
    """The preset's derived sub-block key must actually cut candidates:
    a same-block y whose name initial differs is never proposed."""
    cfg = MatchConfig.production(
        rules=(ColumnRule("first", ("y_first",), threshold=60.0),),
        block_on=("state",),
        required_threshold=60.0,
    )
    x = _x(spark, [(1, "TX", "dana", "q")])
    # 'dana' vs 'dane' clears 60; 'lana' also clears 60 on raw score but
    # starts with a different initial, so only 'dane' may be proposed
    y = _y(
        spark,
        [(10, "TX", "dane", "q", ""), (11, "TX", "dana", "q", ""),
         (12, "TX", "lana", "q", "")],
    )
    rows = fuzzy_match(x, y, cfg).collect()
    assert len(rows) == 1
    assert rows[0].candidate_id == 11  # exact beats typo
    assert rows[0].n_candidates == 2  # dane+dana qualify; lana never paired


def test_subblocked2_preserves_matches_vs_subblocked(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES

    one = QUERIES["linkage_fuzzy_match_subblocked"].builder(spark, sf_dir).collect()
    two = QUERIES["linkage_fuzzy_match_subblocked2"].builder(spark, sf_dir).collect()
    m1 = {r["x_id"]: r["candidate_id"] for r in one if r["match_status"] == "matched"}
    m2 = {r["x_id"]: r["candidate_id"] for r in two if r["match_status"] == "matched"}
    for x_id, cand in m1.items():
        assert m2.get(x_id) == cand, (x_id, cand, m2.get(x_id))
    c1 = {r["x_id"]: r["n_candidates"] for r in one}
    c2 = {r["x_id"]: r["n_candidates"] for r in two}
    assert all(c2[x] <= c1[x] for x in c2)


def test_wratio_subblocked_preserves_matches(spark, sf_dir):
    """The secondary name-initial block applied to the WRatio pandas-
    scorer tier must not lose any match the nation-block-only tier
    finds (trailing-typo model preserves the initial), and must search
    no more candidates per x row — the same contract the levenshtein
    sub-block twin pins, on the tier where the pair cut also cuts
    Arrow-boundary traffic."""
    from sig_etl_spark.queries import QUERIES

    full = QUERIES["linkage_fuzzy_match_wratio"].builder(spark, sf_dir).collect()
    sub = (
        QUERIES["linkage_fuzzy_match_wratio_subblocked"]
        .builder(spark, sf_dir)
        .collect()
    )
    fm = {r["x_id"]: r["candidate_id"] for r in full if r["match_status"] == "matched"}
    sm = {r["x_id"]: r["candidate_id"] for r in sub if r["match_status"] == "matched"}
    assert fm, "wratio fixture produced no matches"
    for x_id, cand in fm.items():
        assert sm.get(x_id) == cand, (x_id, cand, sm.get(x_id))
    fc = {r["x_id"]: r["n_candidates"] for r in full}
    sc = {r["x_id"]: r["n_candidates"] for r in sub}
    assert all(sc[x] <= fc[x] for x in sc)


def test_banded_levenshtein_equals_gated_full(spark):
    """banded_levenshtein_ratio must agree with the full ratio wherever
    the score clears the gate, and return 0 (never a wrong positive
    score) below it — the exact contract fuzzy_match's rule gate
    relies on for the O(len*band) cut."""
    from pyspark.sql import functions as F

    from sig_etl_spark.linkage.scorers import (
        banded_levenshtein_ratio,
        levenshtein_ratio,
    )

    rows = [
        ("abcdefghij", "abcdefghij"),   # identical -> 100
        ("abcdefghij", "abcdefghix"),   # 1 edit / 10 -> 90
        ("abcdefghij", "abcdefgxyz"),   # 3 edits -> 70 (sub-gate)
        ("abcdefghij", "zzzzzzzzzz"),   # all different -> 0
        ("", ""),                        # empty-vs-empty -> 100
        ("", "abc"),                     # -> sub-gate
        ("aaaaaaaaaaaaaaaaaaab", "aaaaaaaaaaaaaaaaaaaa"),  # 1/20 -> 95
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    for gate in (75.0, 85.0, 95.0):
        got = df.select(
            levenshtein_ratio(F.col("a"), F.col("b")).alias("full"),
            banded_levenshtein_ratio(F.col("a"), F.col("b"), gate).alias("band"),
        ).collect()
        for r in got:
            if r["full"] >= gate:
                assert r["band"] == r["full"], (gate, r)
            else:
                assert r["band"] == 0.0 or r["band"] == r["full"] < gate, (gate, r)
            # after gating, identical either way
            g_full = r["full"] if r["full"] >= gate else 0.0
            g_band = r["band"] if r["band"] >= gate else 0.0
            assert g_full == g_band, (gate, r)


def test_banded_levenshtein_exact_gate_boundary(spark):
    """Regression: a pair whose score EXACTLY meets the gate must survive
    banding. With floor(denom * (100-gate)/100.0) the float product can
    land 1 ulp below the exact band (gate=42, len=100: 57.999... -> 57
    instead of 58) and the gate-meeting pair was silently zeroed; the
    ceil() band cannot underestimate."""
    from pyspark.sql import functions as F

    from sig_etl_spark.linkage.scorers import (
        banded_levenshtein_ratio,
        levenshtein_ratio,
    )

    # distance k on length-100 strings -> score exactly 100-k at the gate
    cases = [("a" * 100, "a" * (100 - k) + "b" * k, float(100 - k))
             for k in (58, 70, 69, 57, 15)]
    df = spark.createDataFrame(
        [(a, b, g) for a, b, g in cases], "a string, b string, gate double"
    )
    for a, b, gate in cases:
        row = (
            df.where(F.col("gate") == gate)
            .select(
                levenshtein_ratio(F.col("a"), F.col("b")).alias("full"),
                banded_levenshtein_ratio(F.col("a"), F.col("b"), gate).alias("band"),
            )
            .collect()[0]
        )
        assert row["full"] >= gate, (gate, row)
        assert row["band"] == row["full"], (gate, row)


def test_banded_gate_band_never_underestimates_property():
    """Property (hypothesis): the float band expression Spark evaluates —
    ceil((denom * (100.0 - gate)) / 100.0) in IEEE doubles — is never
    below the exact rational band floor(denom*(100-gate)/100), for any
    length and any representable gate; and overestimates by at most one
    DP diagonal (the documented cost bound). Python floats ARE IEEE
    doubles, so this mirrors the JVM arithmetic exactly."""
    import math
    from fractions import Fraction

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=2000, deadline=None)
    @given(
        st.integers(min_value=1, max_value=5000),
        st.one_of(
            st.integers(min_value=0, max_value=100).map(float),
            st.decimals(
                min_value=0, max_value=100, places=1, allow_nan=False
            ).map(float),
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        ),
    )
    def check(denom, gate):
        computed = math.ceil((denom * (100.0 - gate)) / 100.0)
        exact = math.floor(
            denom * (Fraction(100) - Fraction(gate)) / 100
        )
        assert computed >= exact, (denom, gate, computed, exact)
        assert computed <= exact + 1, (denom, gate, computed, exact)

    check()


def test_lenband_preserves_matches_exactly(spark, sf_dir):
    """The length-band tertiary key is GATE-PROVABLY lossless (pairs in
    bands >= 2 apart have |dlen| >= 5 > 0.15*max_len, so they cannot
    reach the 85 name gate): unlike the one-directional subset contracts
    above, matched/review/qualifying results must be IDENTICAL to the
    composed baseline, not merely a subset."""
    from sig_etl_spark.queries import QUERIES

    base = (
        QUERIES["linkage_fuzzy_match_subblocked_salted"]
        .builder(spark, sf_dir)
        .collect()
    )
    lb = QUERIES["linkage_fuzzy_match_lenband"].builder(spark, sf_dir).collect()
    bq = {
        r["x_id"]: (r["candidate_id"], r["match_score"], r["n_candidates"], r["match_status"])
        for r in base
        if r["match_status"] != "unmatched"
    }
    lq = {
        r["x_id"]: (r["candidate_id"], r["match_score"], r["n_candidates"], r["match_status"])
        for r in lb
        if r["match_status"] != "unmatched"
    }
    assert bq, "composed baseline produced no matches"
    assert bq == lq
    # and no x row changes status class at all
    bs = {r["x_id"]: r["match_status"] for r in base}
    ls = {r["x_id"]: r["match_status"] for r in lb}
    assert bs == ls


# --- Frozen WRatio golden fixture on reference-shaped names ----------------
# VERDICT r10 task 7: tests/fixtures/wratio_golden.csv freezes expected
# WRatio / partial_token_ratio values (plus the three component scorers)
# for the name-pair shapes the reference's matcher actually scores —
# nickname-vs-firstname fallbacks, comma-inverted full names, particle
# surnames, suffix variants, lastname typos, length-skewed short forms
# (reference semantics: /root/reference/votervoice/match.py:49-77).
# Values are checked-in LITERALS derived from the public rapidfuzz indel
# definitions (hand-verified sample in the generation commit), so a
# scorer regression in EITHER tier goes red against frozen numbers, not
# against the engine's own current output.

def _wratio_golden_rows():
    import csv
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "wratio_golden.csv")
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def test_wratio_golden_fixture_scalar_tier():
    from sig_etl_spark.linkage.scorers import (
        py_partial_ratio,
        py_partial_token_ratio,
        py_ratio,
        py_token_sort_ratio,
        py_wratio,
    )

    rows = _wratio_golden_rows()
    assert len(rows) == 28
    fns = {
        "ratio": py_ratio,
        "partial_ratio": py_partial_ratio,
        "token_sort_ratio": py_token_sort_ratio,
        "partial_token_ratio": py_partial_token_ratio,
        "wratio": py_wratio,
    }
    for r in rows:
        for col, fn in fns.items():
            assert fn(r["a"], r["b"]) == pytest.approx(float(r[col]), abs=1e-6), (
                r["a"], r["b"], col,
            )


def test_wratio_golden_fixture_batch_tier():
    """The vectorized pandas tier (the one the linkage UDF actually runs
    when rapidfuzz is absent) must reproduce the same frozen values."""
    import pandas as pd

    from sig_etl_spark.linkage.scorers import _batch_score

    rows = _wratio_golden_rows()
    a = pd.Series([r["a"] for r in rows])
    b = pd.Series([r["b"] for r in rows])
    for col in ("ratio", "partial_ratio", "token_sort_ratio",
                "partial_token_ratio", "wratio"):
        got = _batch_score(col, a, b)
        for i, r in enumerate(rows):
            assert got[i] == pytest.approx(float(r[col]), abs=1e-6), (
                r["a"], r["b"], col,
            )


def test_wratio_golden_fixture_rapidfuzz_tier():
    """When rapidfuzz IS importable (the reference's own scorer lib), its
    WRatio / partial ratios must agree with the frozen fixture — the
    direct parity check the pure-Python tier stands in for."""
    rf = pytest.importorskip("rapidfuzz")

    fns = {
        "ratio": rf.fuzz.ratio,
        "partial_ratio": rf.fuzz.partial_ratio,
        "token_sort_ratio": rf.fuzz.token_sort_ratio,
        "partial_token_ratio": rf.fuzz.partial_token_ratio,
        "wratio": rf.fuzz.WRatio,
    }
    for r in _wratio_golden_rows():
        for col, fn in fns.items():
            assert float(fn(r["a"], r["b"])) == pytest.approx(
                float(r[col]), abs=1e-4
            ), (r["a"], r["b"], col)
