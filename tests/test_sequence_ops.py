"""Invariant tests for the sequence/mixing operators added in round 5:
events_transition_matrix, events_session_paths, llm_lexical_diversity,
llm_bigram_coverage, llm_temperature_mix. Each is also oracle-checked;
these tests pin the semantic invariants the hash alone doesn't name."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _q(name):
    from sig_etl_spark.queries import QUERIES

    return QUERIES[name].builder


def test_transition_probabilities_sum_to_one(spark, sf_dir):
    df = _q("events_transition_matrix")(spark, sf_dir)
    sums = (
        df.groupBy("event_type")
        .agg(F.sum("p").alias("psum"), F.sum("n").alias("nsum"))
        .collect()
    )
    assert sums, "no transitions found"
    for r in sums:
        assert abs(r["psum"] - 1.0) < 1e-9, r
        assert r["nsum"] > 0


def test_transition_matrix_matches_manual_lead(spark, sf_dir):
    # Independent recomputation via a self-join on per-user sequence rank.
    from sig_etl_spark.tables import load_table
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(w))
    a = r.select("user_id", "rn", F.col("event_type").alias("event_type"))
    b = r.select(
        "user_id",
        (F.col("rn") - 1).alias("rn"),
        F.col("event_type").alias("next_type"),
    )
    manual = (
        a.join(b, ["user_id", "rn"])
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_manual"))
    )
    got = _q("events_transition_matrix")(spark, sf_dir).select(
        "event_type", "next_type", "n"
    )
    diff = got.join(manual, ["event_type", "next_type"], "full_outer").filter(
        (F.col("n").isNull())
        | (F.col("n_manual").isNull())
        | (F.col("n") != F.col("n_manual"))
    )
    assert diff.count() == 0


def test_session_paths_capped_and_ranked(spark, sf_dir):
    rows = _q("events_session_paths")(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= 5


def test_lexical_diversity_bounds(spark, sf_dir):
    rows = _q("llm_lexical_diversity")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert 0 <= r["n_hapax"] <= r["n_distinct"]
        assert 0.0 < r["ttr"] <= 1.0
        assert r["ttr"] == r["n_distinct"] / r["n_tokens"]
        assert r["hapax_rate"] == r["n_hapax"] / r["n_tokens"]


def test_bigram_coverage_bounds(spark, sf_dir):
    rows = _q("llm_bigram_coverage")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_in_model"] <= r["n_bigrams"]
        assert r["coverage"] == r["n_in_model"] / r["n_bigrams"]


def test_temperature_mix_take_rule(spark, sf_dir):
    from sig_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    true_counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = (
        _q("llm_temperature_mix")(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("taken"), F.first("n_source").alias("n_source"))
        .collect()
    )
    assert got
    for r in got:
        n = true_counts[r["source"]]
        assert r["n_source"] == n
        assert r["taken"] == min(n, math.floor(8 * math.sqrt(n)))


def test_temperature_mix_upweights_tail(spark, sf_dir):
    # The sampled share of a small source must be >= that of a larger one.
    got = (
        _q("llm_temperature_mix")(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("taken"), F.first("n_source").alias("n_source"))
        .collect()
    )
    if len(got) < 2:
        return
    by_n = sorted(got, key=lambda r: r["n_source"])
    shares = [r["taken"] / r["n_source"] for r in by_n]
    for small, big in zip(shares, shares[1:]):
        assert small >= big - 1e-12


def test_group_ols_matches_numpy(spark, sf_dir):
    import numpy as np
    from sig_etl_spark.tables import load_table

    got = {r["l_returnflag"]: r for r in _q("agg_group_ols")(spark, sf_dir).collect()}
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in pdf.groupby("l_returnflag"):
        slope, intercept = np.polyfit(grp["l_quantity"], grp["l_extendedprice"], 1)
        r = got[flag]
        assert r["n"] == len(grp)
        assert abs(r["slope"] - slope) < 1e-6 * max(1.0, abs(slope))
        assert abs(r["intercept"] - intercept) < 1e-6 * max(1.0, abs(intercept))
        assert 0.0 <= r["r2"] <= 1.0


def test_pareto_share_monotone_and_bounded(spark, sf_dir):
    rows = _q("orders_pareto_share")(spark, sf_dir).orderBy("rnk").collect()
    assert rows and rows[0]["rnk"] == 1
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert 0.0 < shares[-1] <= 1.0


def test_sliding_window_avg_matches_brute_filter(spark, sf_dir):
    import datetime

    from sig_etl_spark.tables import load_table

    rows = _q("events_sliding_window_avg")(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    # spot-check 5 rows against a brute-force trailing filter
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"]))[:: max(1, len(rows) // 5)]:
        lo = r["day"] - datetime.timedelta(days=2)
        sel = ev[
            (ev["event_type"] == r["event_type"])
            & (ev["day"] >= lo)
            & (ev["day"] <= r["day"])
        ]
        assert r["n_3d"] == len(sel)
        assert abs(r["avg_3d"] - sel["value"].mean()) < 1e-9


def test_minhash_calibration_error_bounds(spark, sf_dir):
    rows = _q("llm_minhash_calibration")(spark, sf_dir).collect()
    assert rows, "no LSH candidate pairs at this sf"
    for r in rows:
        assert 0.5 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1e-15
    # 64-hash signatures: mean |estimate - truth| should be well under
    # the ~1/sqrt(64)=0.125 sampling sigma on the high-similarity pairs
    # the LSH gate admits.
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 0.2, mean_err


def test_minhash_calibration_covers_lsh_pairs(spark, sf_dir):
    lsh = {
        (r["id_a"], r["id_b"])
        for r in _q("llm_minhash_lsh")(spark, sf_dir).collect()
    }
    cal = {
        (r["id_a"], r["id_b"])
        for r in _q("llm_minhash_calibration")(spark, sf_dir).collect()
    }
    assert cal == lsh


def test_anomaly_mad_matches_numpy(spark, sf_dir):
    import numpy as np

    from sig_etl_spark.tables import load_table

    # Discrete (type-1 inverse-CDF) median: the actual element at rank
    # ceil(n/2) — the seam-proof rule the query switched to in round 6
    # (percentile_disc / quantile_disc), not numpy's interpolated median.
    def disc_median(v):
        s = np.sort(v)
        return s[int(np.ceil(0.5 * len(s))) - 1]

    got = {r["event_type"]: r for r in _q("events_anomaly_mad")(spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    assert got
    for etype, grp in pdf.groupby("event_type"):
        v = grp["value"].to_numpy()
        med = disc_median(v)
        mad = disc_median(np.abs(v - med))
        r = got[etype]
        assert abs(r["med"] - med) < 1e-9
        assert abs(r["mad"] - mad) < 1e-9
        assert r["n"] == len(v)
        assert r["n_outliers"] == int((np.abs(v - med) > 3 * 1.4826 * mad).sum())
        assert r["n_outliers"] <= r["n"]


def test_sliding_distinct_users_matches_brute_force(spark, sf_dir):
    import datetime

    from sig_etl_spark.tables import load_table

    rows = {r["day"]: r["active_7d"] for r in _q("events_sliding_distinct_users")(spark, sf_dir).collect()}
    assert rows
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    for day, got in rows.items():
        lo = day - datetime.timedelta(days=6)
        want = ev[(ev["day"] >= lo) & (ev["day"] <= day)]["user_id"].nunique()
        assert got == want, (day, got, want)


def test_rfm_segments_consistent_with_numpy_quartiles(spark, sf_dir):
    import numpy as np

    from sig_etl_spark.queries import QUERIES

    rows = QUERIES["orders_rfm_segmentation"].builder(spark, sf_dir).collect()
    assert rows
    rec = np.array([r["recency_days"] for r in rows], dtype=float)
    freq = np.array([r["frequency"] for r in rows], dtype=float)
    mon = np.array([r["monetary_cents"] for r in rows], dtype=float)
    # Discrete (type-1 / inverted-CDF) quartile boundaries — the round-6
    # seam-proof rule (percentile_disc): actual data elements, not
    # numpy's default interpolation.
    rq = np.quantile(rec, [0.25, 0.5, 0.75], method="inverted_cdf")
    fq = np.quantile(freq, [0.25, 0.5, 0.75], method="inverted_cdf")
    mq = np.quantile(mon, [0.25, 0.5, 0.75], method="inverted_cdf")
    for r in rows:
        assert r["r_quart"] == 1 + sum(r["recency_days"] > q for q in rq)
        assert r["f_quart"] == 1 + sum(r["frequency"] < q for q in fq[::-1])
        assert r["m_quart"] == 1 + sum(r["monetary_cents"] < q for q in mq[::-1])
        assert r["segment"] == f'{r["r_quart"]}{r["f_quart"]}{r["m_quart"]}'
        assert 1 <= r["r_quart"] <= 4 and 1 <= r["f_quart"] <= 4 and 1 <= r["m_quart"] <= 4


def test_part_affinity_matches_pandas(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    from sig_etl_spark.tables import load_table

    rows = _q("j_part_affinity")(spark, sf_dir).collect()
    assert rows
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    co = Counter()
    cnt = Counter(pdf["l_partkey"])
    n_orders = pdf["l_orderkey"].nunique()
    for _, grp in pdf.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"]), 2):
            co[(a, b)] += 1
    for r in rows:
        key = (r["part_a"], r["part_b"])
        assert co[key] == r["co"]
        assert cnt[r["part_a"]] == r["cnt_a"]
        assert cnt[r["part_b"]] == r["cnt_b"]
        assert abs(r["lift"] - n_orders * r["co"] / (r["cnt_a"] * r["cnt_b"])) < 1e-12
    max_co = max(co.values())
    assert rows[0]["co"] == max_co if hasattr(rows[0], "co") else True


def test_ab_test_matches_statsmodels_formula(spark, sf_dir):
    import math

    r = _q("events_ab_test")(spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    p = (r["c_a"] + r["c_b"]) / (r["n_a"] + r["n_b"])
    se = math.sqrt(p * (1 - p) * (1 / r["n_a"] + 1 / r["n_b"]))
    z = (r["c_a"] / r["n_a"] - r["c_b"] / r["n_b"]) / se
    assert abs(r["z"] - z) < 1e-12
    assert r["significant"] == (abs(z) >= 1.96)


def test_monthly_growth_matches_pandas(spark, sf_dir):
    from sig_etl_spark.tables import load_table

    rows = sorted(
        _q("orders_monthly_growth")(spark, sf_dir).collect(), key=lambda r: r["month"]
    )
    assert rows
    pdf = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    pdf["month"] = pdf["o_orderdate"].dt.to_period("M")
    g = pdf.groupby("month")["o_totalprice"].agg(["sum", "count"])
    assert len(rows) == len(g)
    assert rows[0]["mom_growth"] is None
    for prev, cur in zip(rows, rows[1:]):
        want = (cur["revenue"] - prev["revenue"]) / prev["revenue"]
        assert abs(cur["mom_growth"] - want) < 1e-9


def test_rag_pack_budget_and_greedy_prefix(spark, sf_dir):
    rows = _q("llm_rag_pack")(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        # kept set is a PREFIX of the rank order (greedy rule)
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cum = 0
        for r in rs:
            cum += r["n_chars"]
            assert r["cum_chars"] == cum
        assert cum <= 1200


def test_cohort_ltv_monotone_and_consistent(spark, sf_dir):
    rows = _q("orders_cohort_ltv")(spark, sf_dir).collect()
    assert rows
    by_c = {}
    for r in rows:
        by_c.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_c.items():
        rs.sort(key=lambda r: r["months_since"])
        # month-0 cell exists (the cohort's own first orders) and every
        # cell's actives are within cohort size
        assert rs[0]["months_since"] == 0
        sizes = {r["cohort_size"] for r in rs}
        assert len(sizes) == 1
        for r in rs:
            assert 1 <= r["active_customers"] <= r["cohort_size"]
        # cumulative LTV is nondecreasing in months_since
        ltv = [r["cum_ltv_per_customer"] for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(ltv, ltv[1:]))


def test_fertility_and_stickiness_bounds(spark, sf_dir):
    frows = _q("llm_tokenizer_fertility")(spark, sf_dir).collect()
    assert frows
    for r in frows:
        # BPE-ish splitting never merges words: fertility >= 1
        assert r["fertility"] >= 1.0
        assert r["bpe_tokens"] >= r["ws_tokens"] > 0
    srows = _q("events_dau_stickiness")(spark, sf_dir).collect()
    assert srows
    for r in srows:
        assert 1 <= r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["stickiness"] == r["dau"] / r["wau"]


def test_funnel_dropoff_consistent_with_funnel(spark, sf_dir):
    rows = {r["stage"]: r for r in _q("events_funnel_dropoff")(spark, sf_dir).collect()}
    assert set(rows) == {"signup", "click", "purchase"}
    f = _q("events_funnel")(spark, sf_dir).collect()
    s1 = sum(r["signup_ts"] is not None for r in f)
    s2 = sum(r["click_ts"] is not None for r in f)
    s3 = sum(r["purchase_ts"] is not None for r in f)
    assert rows["signup"]["n_users"] == s1
    assert rows["click"]["n_users"] == s2
    assert rows["purchase"]["n_users"] == s3
    assert s1 >= s2 >= s3
    assert rows["purchase"]["conv_from_start"] <= rows["click"]["conv_from_start"] <= 1.0


def test_mixture_report_reconciles_with_mix(spark, sf_dir):
    got = {r["source"]: r for r in _q("llm_mixture_report")(spark, sf_dir).collect()}
    mix = (
        _q("llm_temperature_mix")(spark, sf_dir)
        .groupBy("source")
        .count()
        .collect()
    )
    assert got
    for r in mix:
        assert got[r["source"]]["n_sampled"] == r["count"]
    sb = sum(r["share_before"] for r in got.values())
    sa = sum(r["share_after"] for r in got.values())
    assert abs(sb - 1.0) < 1e-9 and abs(sa - 1.0) < 1e-9
    # small sources upweight, large sources downweight
    by_n = sorted(got.values(), key=lambda r: r["n_source"])
    assert by_n[0]["upweight"] >= by_n[-1]["upweight"]


def test_prefix_dedup_finds_planted_truncations(spark, sf_dir):
    rows = _q("llm_prefix_dedup")(spark, sf_dir).collect()
    assert rows
    spread = [r for r in rows if r["has_length_spread"]]
    assert spread, "planted truncated twins must produce length-spread groups"
    for r in rows:
        assert r["n_docs"] >= 2
        assert r["min_toks"] <= r["max_toks"]
        assert r["has_length_spread"] == (r["max_toks"] > r["min_toks"])
        assert r["min_toks"] >= 20


def test_gap_distribution_matches_manual_bitlength(spark, sf_dir):
    import pandas as pd

    from sig_etl_spark.tables import load_table

    got = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in _q("events_gap_distribution")(spark, sf_dir).collect()
    }
    assert got
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["gap_us"] = (
        ev.groupby("user_id")["ts"].diff().dt.total_seconds() * 1_000_000
    ).round()
    want: dict = {}
    for _, r in ev.dropna(subset=["gap_us"]).iterrows():
        g = int(r["gap_us"])
        b = 0 if g <= 0 else g.bit_length()
        want[(r["event_type"], b)] = want.get((r["event_type"], b), 0) + 1
    assert got == want


def test_attribution_conserves_millis_and_matches_pandas(spark, sf_dir):
    """Every purchase with >=1 prior-24h touch distributes EXACTLY 1000
    milli-credits (integer conservation — the reason the model is
    integer-divided with a pinned remainder), and the per-type rollup
    matches a pandas recompute of the same U-shaped rule."""
    import pandas as pd

    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.tables import load_table

    got = {
        r["event_type"]: r
        for r in QUERIES["events_attribution"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).toPandas()
    purchases = ev[ev["event_type"] == "purchase"]
    touches = ev[ev["event_type"].isin(["click", "view"])]
    want = {}
    for p in purchases.itertuples(index=False):
        lo = p.ts - pd.Timedelta(seconds=86400)
        t = touches[
            (touches["user_id"] == p.user_id)
            & (touches["ts"] >= lo)
            & (touches["ts"] < p.ts)
        ].sort_values(["ts", "event_id"])
        k = len(t)
        if k == 0:
            continue
        credits = (
            [1000] if k == 1 else [500, 500] if k == 2 else
            [400]
            + [200 // (k - 2) + (200 % (k - 2) if i == 0 else 0)
               for i in range(k - 2)]
            + [400]
        )
        assert sum(credits) == 1000, (p.event_id, k)
        for (typ, c) in zip(t["event_type"], credits):
            n, m = want.get(typ, (0, 0))
            want[typ] = (n + 1, m + c)
    assert want, "fixture produced no attributed purchases"
    assert set(got) == set(want)
    for typ, (n, millis) in want.items():
        assert got[typ]["n_touch_credits"] == n
        assert got[typ]["credit_millis"] == millis


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES

    """SCD2 invariants the oracle hash can't state directly: per user,
    versions are 1..n contiguous, consecutive intervals abut exactly
    (valid_to == next valid_from — no gap, no overlap), exactly one row
    is current, and only the current row has a NULL valid_to."""
    rows = (
        QUERIES["dim_scd2_intervals"].builder(spark, sf_dir)
        .orderBy("user_id", "version")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, vs in by_user.items():
        assert [v.version for v in vs] == list(range(1, len(vs) + 1)), user
        assert sum(v.is_current for v in vs) == 1, user
        assert vs[-1].is_current == 1 and vs[-1].valid_to is None, user
        for a, b in zip(vs, vs[1:]):
            assert a.is_current == 0 and a.valid_to == b.valid_from, user
            assert a.event_type != b.event_type, (user, a.version)


def test_q13_distribution_conserves_customers(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES

    """The order-count distribution must account for every customer
    exactly once (zero-order customers included)."""
    from sig_etl_spark.tables import load_table

    dist = QUERIES["j_q13_order_count_distribution"].builder(spark, sf_dir).collect()
    n_customers = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in dist) == n_customers
    # The zero bucket must exist exactly when some customer has no
    # qualifying (non-excluded-priority) orders.
    from sig_etl_spark.queries.relational import _Q13_EXCLUDED_PRIORITY

    n_ordering = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != _Q13_EXCLUDED_PRIORITY)
        .select("o_custkey")
        .distinct()
        .count()
    )
    zero = sum(r.custdist for r in dist if r.c_count == 0)
    assert zero == n_customers - n_ordering


def test_q21_sole_late_rule_matches_bruteforce(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES

    """The de-correlated per-order aggregate must equal the literal
    EXISTS/NOT-EXISTS rule computed by brute force on the driver."""
    from pyspark.sql import functions as F

    from sig_etl_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).collect()
    from collections import defaultdict

    supp, late = defaultdict(set), defaultdict(set)
    for r in joined:
        supp[r.l_orderkey].add(r.l_suppkey)
        if (r.l_shipdate - r.o_orderdate).total_seconds() > 90 * 86400:
            late[r.l_orderkey].add(r.l_suppkey)
    want = defaultdict(int)
    for ok, suppliers in supp.items():
        if len(suppliers) > 1 and len(late[ok]) == 1:
            want[next(iter(late[ok]))] += 1
    s_name = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    expect = defaultdict(int)
    for sk, n in want.items():
        expect[s_name[sk]] += n
    got = {
        r.s_name: r.numwait
        for r in QUERIES["j_q21_waiting_supplier"].builder(spark, sf_dir).collect()
    }
    top = dict(
        sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    )
    assert got == top
