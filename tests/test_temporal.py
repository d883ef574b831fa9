"""asof_join semantics: backward/forward, exact-tie visibility, tolerance,
unmatched-left null survival."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sig_etl_spark.temporal import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p10"), (1, _ts(20), "p20"), (2, _ts(5), "p5")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (3, _ts(1), 999.0)],
        "user_id long, ts timestamp, v double",
    )
    return left, right


def test_backward_with_exact_tie(spark, frames):
    left, right = frames
    out = {
        (r.user_id, r.tag): r.v_r
        for r in asof_join(left, right, on="ts", by=["user_id"]).collect()
    }
    # exact-ts right row is visible (allow_exact_matches semantics)
    assert out[(1, "p10")] == 100.0
    # latest at-or-before wins
    assert out[(1, "p20")] == 150.0
    # user 2 has no right rows -> left row survives with null
    assert out[(2, "p5")] is None


def test_backward_tolerance(spark, frames):
    left, right = frames
    out = {
        (r.user_id, r.tag): r.v_r
        for r in asof_join(
            left, right, on="ts", by=["user_id"], tolerance_s=120.0
        ).collect()
    }
    assert out[(1, "p10")] == 100.0  # gap 0 <= 120s
    assert out[(1, "p20")] is None  # gap 300s > 120s -> nulled, row kept
    assert len(out) == 3


def test_forward(spark, frames):
    left, right = frames
    out = {
        (r.user_id, r.tag): r.v_r
        for r in asof_join(
            left, right, on="ts", by=["user_id"], direction="forward"
        ).collect()
    }
    assert out[(1, "p10")] == 100.0  # exact tie visible forward too
    assert out[(1, "p20")] is None  # nothing at-or-after
    assert out[(2, "p5")] is None


def test_bad_direction(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="ts", by=["user_id"], direction="nearest")


def test_range_join_bucket_edges(spark):
    from sig_etl_spark.temporal import range_join

    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 299.0, "b"), (1, 300.0, "c"), (2, 50.0, "d")],
        "k long, ts double, tag string",
    )
    right = spark.createDataFrame(
        # interval spanning a bucket edge; one fully inside; one degenerate
        [(1, 250.0, 350.0, "r1"), (1, 0.0, 20.0, "r2"), (2, 60.0, 40.0, "bad")],
        "k long, lo double, hi double, rtag string",
    )
    out = range_join(
        left, right, left_ts="ts", right_start="lo", right_end="hi",
        by=["k"], bucket_s=100,
    )
    pairs = sorted((r.tag, r.rtag_r) for r in out.collect())
    # a@10 in r2; b@299 + c@300 in r1 (both sides of the 300 bucket edge);
    # degenerate interval matches nothing
    assert pairs == [("a", "r2"), ("b", "r1"), ("c", "r1")]
    # no duplicate pairs despite r1 spanning two buckets
    assert len(pairs) == len(set(pairs))


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property: asof_join == pandas.merge_asof on random inputs."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(3):
        nl, nr = 60, 40
        lp = pd.DataFrame(
            {
                "k": rng.integers(0, 5, nl),
                "ts": rng.integers(0, 1000, nl).astype("float64"),
                "lv": np.arange(nl, dtype="int64"),
            }
        )
        rp = pd.DataFrame(
            {
                "k": rng.integers(0, 5, nr),
                "ts": rng.integers(0, 1000, nr).astype("float64"),
                "rv": np.arange(nr, dtype="int64"),
            }
        )
        # unique (k, ts) on the right: asof tie-handling is otherwise
        # engine-defined (documented contract requires pre-dedup)
        rp = rp.drop_duplicates(["k", "ts"])
        exp = pd.merge_asof(
            lp.sort_values(["ts", "lv"]).reset_index(drop=True),
            rp.sort_values("ts").reset_index(drop=True),
            on="ts", by="k", direction="backward", suffixes=("", "_r"),
        )
        exp_map = dict(zip(exp["lv"], exp["rv"]))

        left = spark.createDataFrame(lp)
        right = spark.createDataFrame(rp)
        from sig_etl_spark.temporal import asof_join

        got = {
            r.lv: r.rv_r
            for r in asof_join(left, right, on="ts", by=["k"]).collect()
        }
        assert len(got) == nl
        for lv, rv in got.items():
            e = exp_map[lv]
            if rv is None:
                assert pd.isna(e), (trial, lv, e)
            else:
                assert e == rv, (trial, lv, e, rv)


def test_asof_null_timestamps_match_nothing(spark):
    from sig_etl_spark.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100.0, "ok"), (1, None, "null_ts")],
        "k long, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, 999.0), (1, 50.0, 1.0)],
        "k long, ts double, v double",
    )
    for direction in ("backward", "forward"):
        out = {
            r.tag: r.v_r
            for r in asof_join(
                left, right, on="ts", by=["k"], direction=direction
            ).collect()
        }
        # null-ts left row survives but matches nothing, in both directions
        assert out["null_ts"] is None
        # null-ts right row is never a match candidate
        assert out["ok"] == (1.0 if direction == "backward" else None)


def test_range_join_matches_bruteforce(spark):
    """Property: bucketized range_join == brute-force interval filter,
    for several bucket widths (edge alignment must not matter)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 80),
            "ts": rng.uniform(0, 1000, 80),
            "lv": np.arange(80, dtype="int64"),
        }
    )
    lo = rng.uniform(0, 950, 30)
    rp = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 30),
            "lo": lo,
            "hi": lo + rng.uniform(0, 120, 30),
            "rv": np.arange(30, dtype="int64"),
        }
    )
    merged = lp.merge(rp, on="k")
    brute = set(
        zip(
            merged.loc[(merged.lo <= merged.ts) & (merged.ts <= merged.hi), "lv"],
            merged.loc[(merged.lo <= merged.ts) & (merged.ts <= merged.hi), "rv"],
        )
    )

    from sig_etl_spark.temporal import range_join

    left, right = spark.createDataFrame(lp), spark.createDataFrame(rp)
    for bucket_s in (7, 50, 300, 2000):
        got = {
            (r.lv, r.rv_r)
            for r in range_join(
                left, right, left_ts="ts", right_start="lo", right_end="hi",
                by=["k"], bucket_s=bucket_s,
            ).collect()
        }
        assert got == brute, f"bucket_s={bucket_s}"

def test_asof_duplicate_right_ts_resolves_to_max_payload(spark):
    """Duplicate right (by, ts) rows must resolve deterministically — to
    the field-lexicographic max of the payload struct (the windowed twin
    of a max(struct(*rcols)) pre-reduction), under every partitioning."""
    left = spark.createDataFrame(
        [(1, _ts(20), "x")], "user_id long, ts timestamp, tag string"
    )
    dup_rows = [(1, _ts(10), v, lbl) for v, lbl in
                [(100.0, "a"), (300.0, "c"), (200.0, "b")]]
    for nparts in (1, 3, 7):
        right = spark.createDataFrame(
            dup_rows, "user_id long, ts timestamp, v double, lbl string"
        ).repartition(nparts)
        out = asof_join(left, right, on="ts", by=["user_id"]).collect()
        assert len(out) == 1
        assert out[0].v_r == 300.0 and out[0].lbl_r == "c"


def test_asof_map_payload_skips_tiebreak_but_still_joins(spark):
    """Map-typed right payloads are unorderable: the deterministic
    tiebreak is skipped, but unique (by, ts) rows still join fine."""
    left = spark.createDataFrame(
        [(1, _ts(20), "x")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), {"k": "v"})],
        "user_id long, ts timestamp, attrs map<string,string>",
    )
    out = asof_join(left, right, on="ts", by=["user_id"]).collect()
    assert len(out) == 1 and out[0].attrs_r == {"k": "v"}
