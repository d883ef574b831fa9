"""Unit tests for llm.text_analysis column expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from sig_etl_spark.llm import text_analysis as T


def _vals(spark, text, *exprs):
    return spark.createDataFrame([(text,)], ["t"]).select(*exprs).first()


def test_token_counts(spark):
    r = _vals(
        spark,
        "Hello, world! 42 times",
        T.ws_token_count(F.col("t")).alias("ws"),
        T.bpe_ish_token_count(F.col("t")).alias("bpe"),
    )
    assert r.ws == 4
    # Hello , world ! 42 times -> 6 pre-tokens
    assert r.bpe == 6


def test_ratios(spark):
    r = _vals(
        spark,
        "the cat the cat!!",
        T.stopword_ratio(F.col("t")).alias("stop"),
        T.distinct_token_ratio(F.col("t")).alias("div"),
        T.punct_ratio(F.col("t")).alias("punct"),
    )
    # tokens: the cat the cat!! -> 4 tokens, 2 'the'
    assert r.stop == 0.5
    assert r.div == 0.75  # the, cat, cat!! distinct of 4
    assert r.punct == 2 / 14  # two '!' of 14 non-space chars


def test_empty_text_guards(spark):
    r = _vals(
        spark,
        "   ",
        T.ws_token_count(F.col("t")).alias("ws"),
        T.stopword_ratio(F.col("t")).alias("stop"),
        T.mean_token_len(F.col("t")).alias("mean"),
        T.quality_score(F.col("t")).alias("q"),
    )
    assert r.ws == 0 and r.stop == 0.0 and r.mean == 0.0
    assert r.q is not None


def test_lang_guess(spark):
    for text, want in [
        ("the quick fox and the dog", "en"),
        ("der hund und die katze ist", "de"),
        ("el perro y la casa en los", "es"),
        ("xyzzy plugh qwerty", "und"),
    ]:
        r = _vals(spark, text, T.lang_guess(F.col("t")).alias("g"))
        assert r.g == want, text


def test_fingerprint_properties(spark):
    # identical token streams -> identical fingerprint and exact key
    a = _vals(spark, "a b c d e", T.fingerprint(F.col("t")).alias("fp"),
              T.exact_hash(F.col("t")).alias("k"))
    b = _vals(spark, "  a  b c d e ", T.fingerprint(F.col("t")).alias("fp"),
              T.exact_hash(F.col("t")).alias("k"))
    assert a.fp == b.fp and a.k == b.k
    # short doc (< k tokens) falls back to whole-text shingle
    s = _vals(spark, "ab", T.fingerprint(F.col("t")).alias("fp"))
    assert s.fp is not None
    # shingle array is ordered windows
    sh = _vals(spark, "a b c d", T.shingles(F.col("t"), 3).alias("sh"))
    assert sh.sh == ["a b c", "b c d"]

def test_ngram_repetition_counts(spark):
    from sig_etl_spark.llm.text_analysis import ngram_repetition

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 shingles, 3 distinct
            (2, "all distinct words here now"),  # 3 shingles, all distinct
            (3, "tiny doc"),            # < k tokens -> single joined gram
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in df.select(
        "doc_id", ngram_repetition(F.col("text"), k=3).alias("r")
    ).select("doc_id", "r.n_grams", "r.n_distinct_grams").collect()}
    assert (rows[1].n_grams, rows[1].n_distinct_grams) == (7, 3)
    assert (rows[2].n_grams, rows[2].n_distinct_grams) == (3, 3)
    assert (rows[3].n_grams, rows[3].n_distinct_grams) == (1, 1)


def test_scrub_pii_order_and_counts(spark):
    from sig_etl_spark.llm.text_analysis import (
        pii_email_count,
        pii_phone_count,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.org or 555-123-4567 or bad 55-123-4567")],
        ["id", "text"],
    )
    row = df.select(
        scrub_pii(F.col("text")).alias("clean"),
        pii_email_count(F.col("text")).alias("ne"),
        pii_phone_count(F.col("text")).alias("np"),
    ).collect()[0]
    assert row.clean == "mail [EMAIL] or [PHONE] or bad 55-123-4567"
    assert (row.ne, row.np) == (1, 1)

def test_shard_packing_capacity_invariant(spark, sf_dir):
    """No shard exceeds capacity unless a single document alone does, and
    shard ids per source are dense from 0."""
    from sig_etl_spark.queries import QUERIES

    out = QUERIES["llm_shard_packing"].builder(spark, sf_dir).collect()
    by_shard: dict[tuple, int] = {}
    for r in out:
        by_shard[(r.source, r.shard_id)] = by_shard.get((r.source, r.shard_id), 0) + r.n_tokens
    for (src, sid), total in by_shard.items():
        docs = [r.n_tokens for r in out if r.source == src and r.shard_id == sid]
        assert total < 2000 + max(docs), (src, sid, total)
    for src in {r.source for r in out}:
        ids = sorted({r.shard_id for r in out if r.source == src})
        assert ids == list(range(len(ids))), f"{src}: non-dense shards {ids}"


def test_bucketed_shard_packing_invariants(spark, sf_dir):
    """The skew-proof packer: bucket count per source is exactly
    ceil(rows / bucket_docs_over); shards never exceed capacity except by
    their own final document; shard ids are dense from 0 per bucket; and
    the union of (doc_id) matches the exact packer's coverage."""
    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.queries.llm_text import _BUCKET_DOCS_OVER, _SHARD_CAPACITY

    out = QUERIES["llm_shard_packing_bucketed"].builder(spark, sf_dir).collect()
    rows_per_source: dict[str, int] = {}
    for r in out:
        rows_per_source[r.source] = rows_per_source.get(r.source, 0) + 1
    for src, n in rows_per_source.items():
        want = -(-n // _BUCKET_DOCS_OVER)
        got = {r.bucket for r in out if r.source == src}
        if n > _BUCKET_DOCS_OVER:
            assert got <= set(range(want)), (src, got)
            assert len(got) >= 2, f"{src}: dominant source did not split"
        else:
            assert got == {0}

    by_shard: dict[tuple, list] = {}
    for r in out:
        by_shard.setdefault((r.source, r.bucket, r.shard_id), []).append(r.n_tokens)
    for key, toks in by_shard.items():
        assert sum(toks) < _SHARD_CAPACITY + max(toks), key
    for (src, bkt) in {(r.source, r.bucket) for r in out}:
        sids = sorted({sid for (s, b, sid) in by_shard if s == src and b == bkt})
        assert sids == list(range(len(sids))), (src, bkt, sids)

    exact = QUERIES["llm_shard_packing"].builder(spark, sf_dir).collect()
    assert {r.doc_id for r in out} == {r.doc_id for r in exact}


def test_chunk_overlap_invariants(spark, sf_dir):
    """Chunk grid: stride-aligned starts, overlap consistency, full
    coverage of every token."""
    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.queries.llm_text import _CHUNK_S, _CHUNK_W

    rows = QUERIES["llm_chunk_overlap"].builder(spark, sf_dir).collect()
    docs: dict[int, dict[int, list[str]]] = {}
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.chunk_tokens <= _CHUNK_W
        docs.setdefault(r.doc_id, {})[r.chunk_idx] = toks
    base = {
        r.doc_id: r.text.split()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if r.text.split()
    }
    assert set(docs) == set(base)
    for doc_id, chunks in docs.items():
        n = len(base[doc_id])
        # chunk count matches the stride grid exactly
        assert len(chunks) == len(range(0, n, _CHUNK_S))
        for idx, toks in chunks.items():
            # every chunk is the verbatim token slice at its grid offset
            assert toks == base[doc_id][idx * _CHUNK_S : idx * _CHUNK_S + _CHUNK_W]
        # consecutive full chunks share the W-S token overlap
        for idx in range(len(chunks) - 1):
            if len(chunks[idx]) == _CHUNK_W:
                assert chunks[idx][_CHUNK_S:] == chunks[idx + 1][: _CHUNK_W - _CHUNK_S]


def test_chunk_overlap_is_narrow(spark, sf_dir):
    """The chunker must compile to a shuffle-free (narrow) plan: fan-out
    happens in the scan task, critical at 100 TB."""
    from sig_etl_spark.queries import QUERIES

    df = QUERIES["llm_chunk_overlap"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_boilerplate_scrub_invariants(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.queries.llm_text import _SEG_G

    rows = QUERIES["llm_boilerplate_scrub"].builder(spark, sf_dir).collect()
    base = {
        r.doc_id: r.text.split()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    total_boiler = 0
    for r in rows:
        n = len(base[r.doc_id])
        assert r.n_segments == -(-n // _SEG_G)  # ceil
        assert 0 <= r.n_boilerplate <= r.n_segments
        total_boiler += r.n_boilerplate
        kept = r.clean_text.split() if r.clean_text else []
        # kept tokens are an in-order subsequence of the original doc
        it = iter(base[r.doc_id])
        assert all(tok in it for tok in kept)
    # threshold is calibrated so the corpus actually has boilerplate
    assert total_boiler > 0


def test_boilerplate_scrub_removes_common_segments_only(spark, sf_dir):
    """Cross-check the scrub criterion itself: a segment string absent
    from any clean_text must occur in >= T distinct docs, and every
    kept segment in < T (checked on a sample)."""
    from collections import defaultdict

    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.queries.llm_text import _SEG_G, _SEG_T

    base = {
        r.doc_id: r.text.split()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    seg_docs: dict[str, set[int]] = defaultdict(set)
    for doc_id, toks in base.items():
        for s in range(0, len(toks), _SEG_G):
            seg_docs[" ".join(toks[s : s + _SEG_G])].add(doc_id)
    rows = QUERIES["llm_boilerplate_scrub"].builder(spark, sf_dir).collect()
    for r in rows[:50]:
        toks = base[r.doc_id]
        expect = [
            " ".join(toks[s : s + _SEG_G])
            for s in range(0, len(toks), _SEG_G)
            if len(seg_docs[" ".join(toks[s : s + _SEG_G])]) < _SEG_T
        ]
        assert (r.clean_text.split(" ") if r.clean_text else []) == " ".join(
            expect
        ).split()


def test_source_drift_matches_scipy_style_chi2(spark, sf_dir):
    """Recompute the chi-square statistic with numpy from raw counts."""
    import numpy as np

    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.tables import load_table

    got = {r["source"]: r for r in QUERIES["llm_source_drift"].builder(spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "documents").select("source", "n_chars").toPandas()
    pdf["bucket"] = np.minimum(pdf["n_chars"] // 100, 7)
    obs = pdf.groupby(["source", "bucket"]).size()
    bucket_tot = pdf.groupby("bucket").size()
    n_total = len(pdf)
    assert got
    for src, grp in pdf.groupby("source"):
        n_src = len(grp)
        chi2 = 0.0
        for b, cnt in obs[src].items():
            e = bucket_tot[b] * n_src / n_total
            chi2 += (cnt - e) ** 2 / e
        r = got[src]
        assert r["n_source"] == n_src
        # chi2_milli = ROUND(decimal-accumulated chi2 * 1000): within one
        # milli of the float recompute.
        assert abs(r["chi2_milli"] - chi2 * 1000) <= 1.0
        assert r["chi2_milli"] >= 0


def test_quality_gate_v2_flags_consistent(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES

    rows = QUERIES["llm_quality_gate_v2"].builder(spark, sf_dir).collect()
    assert rows
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept  # the gate keeps something at every fixture scale
    for r in rows:
        assert r["low_diversity"] == (r["ttr"] < 0.35)
        assert r["repetitive"] == (r["dup_gram_ratio"] > 0.30)
        assert r["off_domain"] == (r["coverage"] < 0.58)
        assert r["keep"] == (
            not r["low_diversity"] and not r["repetitive"] and not r["off_domain"]
        )


def test_dataset_card_consistent_with_raw(spark, sf_dir):
    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.tables import load_table

    r = QUERIES["llm_dataset_card"].builder(spark, sf_dir).collect()[0]
    pdf = load_table(spark, sf_dir, "documents").toPandas()
    assert r["n_docs"] == len(pdf)
    assert r["n_sources"] == pdf["source"].nunique()
    assert r["n_langs"] == pdf["lang"].nunique()
    assert r["total_chars"] == int(pdf["n_chars"].sum())
    toks = pdf["text"].str.strip().str.split().map(len)
    assert r["total_tokens"] == int(toks.sum())
    keys = pdf["text"].str.strip().str.split().map(lambda t: " ".join(t))
    assert r["n_exact_dups"] == len(pdf) - keys.nunique()
    assert 0.0 <= r["dup_rate"] < 1.0
    assert abs(r["mean_chars"] - pdf["n_chars"].mean()) < 1e-9


def test_compression_ratio_matches_zlib_and_orders_by_redundancy(spark, sf_dir):
    """Exact recompute of a sample against python zlib, plus the ordering
    property the signal exists for: a highly repetitive text compresses
    to a lower permille than diverse text."""
    import zlib

    from sig_etl_spark.queries import QUERIES
    from sig_etl_spark.tables import load_table

    rows = {
        r["doc_id"]: r
        for r in QUERIES["llm_compression_ratio"].builder(spark, sf_dir).collect()
    }
    sample = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(20)
        .collect()
    )
    assert rows and sample
    for s in sample:
        raw = (s["text"] or "").encode("utf-8")
        r = rows[s["doc_id"]]
        assert r["n_bytes"] == len(raw)
        assert r["n_compressed"] == len(zlib.compress(raw, 6))
        assert r["ratio_permille"] == r["n_compressed"] * 1000 // max(r["n_bytes"], 1)

    # ordering property through the REAL Spark path on a controlled frame
    from sig_etl_spark.llm.text_analysis import compression_ratios

    rep = spark.createDataFrame(
        [(1, "spam ham " * 200), (2, " ".join(f"w{i}x{i * 7 % 91}" for i in range(400)))],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["ratio_permille"]
        for r in compression_ratios(rep, "doc_id", "text").collect()
    }
    assert got[1] < got[2], got


def test_decontaminate_bloom_equals_plain_and_keeps_null_fingerprints(
    spark, sf_dir, tmp_path
):
    """The bloom-pruned variant must be result-identical to the exact
    anti-join — including for NULL-fingerprint rows (null/empty text),
    where a non-null-safe bloom predicate would drop the row from both
    the clean-fast and suspect branches while the left_anti join (and
    the shared NOT EXISTS oracle) keep it."""
    from sig_etl_spark.queries import QUERIES

    plain = {
        (r["doc_id"], r["fingerprint"])
        for r in QUERIES["llm_decontaminate"].builder(spark, sf_dir).collect()
    }
    bloom = {
        (r["doc_id"], r["fingerprint"])
        for r in QUERIES["llm_decontaminate_bloom"].builder(spark, sf_dir).collect()
    }
    assert plain == bloom

    # Controlled corpus with a NULL-text and an empty-text training row:
    # both must survive decontamination in BOTH variants.
    docs = spark.createDataFrame(
        [
            (97 * 1, "shared benchmark shingle text here", "en", "web", 34),
            (1, "shared benchmark shingle text here", "en", "web", 34),
            (2, None, "en", "web", 0),
            (3, "", "en", "web", 0),
            (4, "a clean unrelated training document", "en", "web", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path / "nulls"
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    p = {r["doc_id"] for r in QUERIES["llm_decontaminate"].builder(spark, str(d)).collect()}
    b = {r["doc_id"] for r in QUERIES["llm_decontaminate_bloom"].builder(spark, str(d)).collect()}
    assert p == b, (p, b)
    assert {2, 3, 4} <= p and 1 not in p, p


def test_dsir_ranks_target_vocab_first(spark, tmp_path):
    """DSIR importance weighting must rank pool docs written in the
    TARGET vocabulary strictly above pool docs written in a disjoint
    vocabulary. The driver fixture cannot show this (its lang labels
    share one vocabulary — see the query's docstring), so the
    discriminative property is proven on a planted corpus: 'en' target
    docs use vocab A, background docs vocab B, and unlabeled candidates
    use one or the other."""
    from sig_etl_spark.queries import QUERIES

    va = "alpha beta gamma delta epsilon zeta eta theta"
    vb = "rock stone pebble boulder cliff gravel sand dune"
    rows = []
    did = 0
    for _ in range(20):  # target slice: vocab A
        rows.append((did, va, "en", "target_src", len(va))); did += 1
    for _ in range(20):  # background pool: vocab B
        rows.append((did, vb, "de", "bg_src", len(vb))); did += 1
    target_like = []
    pool_like = []
    for i in range(5):  # unlabeled candidates, alternating vocab
        rows.append((did, va, "xx", "cand", len(va)))
        target_like.append(did); did += 1
        rows.append((did, vb, "xx", "cand", len(vb)))
        pool_like.append(did); did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "dsir"
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = QUERIES["llm_dsir_importance"].builder(spark, str(d)).collect()
    w = {r["doc_id"]: r["weight_proxy"] for r in out}
    assert min(w[i] for i in target_like) > max(w[i] for i in pool_like), w


# ---------------------------------------------------------------------------
# Round 11: span-level decontamination edge semantics (hand-built docs;
# the oracle covers the statistical case, these pin the boundary moves).
# Bench convention: doc_id % 97 == 0.
# ---------------------------------------------------------------------------


def _span_rows(spark, rows):
    from sig_etl_spark.queries.llm_text import span_decontaminate_frame

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = span_decontaminate_frame(df).orderBy("doc_id", "span_idx")
    return [tuple(r) for r in out.collect()]


def test_span_decon_hit_at_position_zero_clamps(spark):
    # bench doc 0 defines the gram "a b c"; doc 1 starts with it, so the
    # poisoned window [-2, 4] clamps to [0, 4] and only the tail survives
    rows = [
        (0, "a b c"),
        (1, "a b c x1 x2 y1 y2 y3 y4 y5"),  # 10 tokens; kept span = [5..9]
    ]
    got = _span_rows(spark, rows)
    assert got == [(1, 1, 0, 5, "y1 y2 y3 y4 y5")]


def test_span_decon_fully_contaminated_doc_vanishes(spark):
    rows = [
        (0, "a b c"),
        (1, "z1 a b c z2"),  # window [0..6] covers all 5 tokens -> no span
    ]
    assert _span_rows(spark, rows) == []


def test_span_decon_untouched_doc_single_full_span(spark):
    rows = [
        (0, "a b c"),
        (1, "p q r s t u"),
    ]
    assert _span_rows(spark, rows) == [(1, 0, 0, 6, "p q r s t u")]


def test_span_decon_two_islands_middle_span_survives(spark):
    # hits at pos 0 and pos 13 of an 18-token doc: windows [0..4] and
    # [11..17]; the middle gap [5..10] is 6 tokens (>= M=5) and survives
    mid = "m1 m2 m3 m4 m5 m6"
    rows = [
        (0, "a b c"),
        (1, f"a b c x1 x2 {mid} y1 y2 a b c z1"),
    ]
    got = _span_rows(spark, rows)
    assert got == [(1, 2, 0, 6, mid)]


def test_span_decon_adjacent_hits_one_span_two_hits(spark):
    # overlapping hits at pos 2 ("a b c") and pos 3 ("b c d"): windows
    # [0..6] and [1..7] overlap, so the complement is ONE tail span —
    # and n_hits must still count BOTH probe hits. The surviving span
    # makes a broken overlap-complement visibly wrong (an implementation
    # that dropped the second window would keep t2 at position 7).
    rows = [
        (0, "a b c b c d"),  # bench grams include "a b c", "b c d"
        (1, "h1 h2 a b c d t1 t2 t3 t4 t5 t6 t7"),
    ]
    got = _span_rows(spark, rows)
    assert got == [(1, 2, 0, 5, "t3 t4 t5 t6 t7")]


def test_span_decon_short_fragment_dropped(spark):
    # surviving head of 4 tokens < M=5 is dropped, tail of 5 kept
    rows = [
        (0, "a b c"),
        (1, "h1 h2 h3 h4 x x a b c x x t1 t2 t3 t4 t5"),
    ]
    got = _span_rows(spark, rows)
    # hit at pos 6: window [4..10]; head [0..3] = 4 tokens -> dropped;
    # tail [11..15] = 5 tokens -> kept
    assert got == [(1, 1, 0, 5, "t1 t2 t3 t4 t5")]


# ---------------------------------------------------------------------------
# Round 11: waterfill invariants on the real table — the oracle pins the
# values; these pin the ALGORITHM's defining properties so a refactor
# that stays hash-green by accident still can't break the semantics.
# ---------------------------------------------------------------------------


def test_waterfill_invariants(spark, sf_dir):
    from sig_etl_spark.queries.llm_text import llm_mixture_waterfill

    rows = llm_mixture_waterfill(spark, sf_dir).collect()
    assert rows, "no sources"
    budget = sum(r.n_tokens for r in rows) * 3 // 5
    alloc = sum(r.alloc_tokens for r in rows)
    sat = [r for r in rows if r.saturated == 1]
    unsat = [r for r in rows if r.saturated == 0]
    # saturated sources take exactly their cap; unsaturated all sit at
    # one common water level strictly below their cap
    for r in sat:
        assert r.alloc_tokens == r.cap_tokens
    levels = {r.alloc_tokens for r in unsat}
    assert len(levels) <= 1
    if unsat:
        lam = levels.pop()
        assert all(r.cap_tokens > lam for r in unsat)
        assert all(r.cap_tokens <= lam for r in sat)
        # budget is filled up to integer-floor remainder
        assert alloc <= budget < alloc + len(unsat)
    else:
        assert alloc <= budget


def test_span_decon_output_contains_no_bench_grams(spark, sf_dir):
    """THE decontamination guarantee: no surviving span contains any
    benchmark k-gram. Recomputed independently in Python over the real
    corpus — if the window/clamp arithmetic ever under-removes by one
    token, this is the test that goes red."""
    from sig_etl_spark.queries.llm_text import _SPAN_K, llm_decontaminate_span
    from sig_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").collect()
    bench_grams = set()
    for r in docs:
        if r.doc_id % 97 == 0:
            t = (r.text or "").split()
            for i in range(len(t) - _SPAN_K + 1):
                bench_grams.add(" ".join(t[i : i + _SPAN_K]))
    assert bench_grams, "fixture has no benchmark grams"

    spans = llm_decontaminate_span(spark, sf_dir).collect()
    assert spans, "no spans survived"
    contaminated = []
    for s in spans:
        t = s.span_text.split()
        assert len(t) == s.span_tokens
        for i in range(len(t) - _SPAN_K + 1):
            if " ".join(t[i : i + _SPAN_K]) in bench_grams:
                contaminated.append((s.doc_id, s.span_idx, i))
    assert not contaminated, contaminated[:5]


def test_release_capstone_shard_fill_bound(spark, sf_dir):
    """Packing invariant: within every (split, source), shard ids are a
    contiguous 0..N run and every shard's token load stays below
    capacity + its largest member (the one-span overflow the running-sum
    rule permits); dedup invariant: no two output rows share span text's
    md5 (verified via n_copies >= 1 and distinct (doc,span))."""
    from collections import defaultdict

    from sig_etl_spark.queries.llm_text import (
        _SHARD_CAPACITY,
        llm_training_release_e2e,
    )

    rows = llm_training_release_e2e(spark, sf_dir).collect()
    assert rows
    keys = [(r.doc_id, r.span_idx) for r in rows]
    assert len(keys) == len(set(keys))
    by_shard = defaultdict(list)
    shards_per_group = defaultdict(set)
    for r in rows:
        assert r.n_copies >= 1
        by_shard[(r.split, r.source, r.shard_id)].append(r.n_tokens)
        shards_per_group[(r.split, r.source)].add(r.shard_id)
    for ids in shards_per_group.values():
        assert ids == set(range(len(ids))), "shard ids not contiguous"
    for toks in by_shard.values():
        assert sum(toks) < _SHARD_CAPACITY + max(toks)


def test_release_bucketed_matches_exact_and_splits_dominant_source(spark):
    """The skew-safe capstone on a crawl-dominant fixture (one source =
    80% of docs): (a) the span set, split labels, and n_copies agree
    row-for-row with the exact variant — bucketing may only change
    shard assignment; (b) the dominant (split, source) group actually
    lands in >1 bucket (the single-task seam is really split); (c) shard
    ids are contiguous and capacity-bounded per (split, source, bucket)."""
    import random
    from collections import defaultdict

    from sig_etl_spark.queries.llm_text import (
        _RELEASE_BUCKET_OVER,
        _SHARD_CAPACITY,
        training_release_frame,
    )

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(60)]
    rows = []
    for i in range(200):
        # doc_id % 97 == 0 rows are the benchmark side inside the frame
        src = "crawl" if i % 10 < 8 else f"cur{i % 3}"
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 40)))
        rows.append((i, src, text))
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")

    exact = training_release_frame(docs).collect()
    bucketed = training_release_frame(
        docs, bucket_spans_over=_RELEASE_BUCKET_OVER
    ).collect()

    key = lambda r: (r.doc_id, r.span_idx)  # noqa: E731
    assert {key(r) for r in exact} == {key(r) for r in bucketed}
    ex = {key(r): (r.split, r.source, r.n_tokens, r.n_copies) for r in exact}
    for r in bucketed:
        assert ex[key(r)] == (r.split, r.source, r.n_tokens, r.n_copies)

    buckets_per_group = defaultdict(set)
    shards_per_pack = defaultdict(set)
    load_per_shard = defaultdict(list)
    for r in bucketed:
        buckets_per_group[(r.split, r.source)].add(r.bucket)
        shards_per_pack[(r.split, r.source, r.bucket)].add(r.shard_id)
        load_per_shard[(r.split, r.source, r.bucket, r.shard_id)].append(
            r.n_tokens
        )
    dominant = max(
        buckets_per_group, key=lambda g: sum(
            1 for r in bucketed if (r.split, r.source) == g
        )
    )
    assert len(buckets_per_group[dominant]) > 1, (
        "dominant group did not sub-bucket", dominant, buckets_per_group
    )
    for ids in shards_per_pack.values():
        assert ids == set(range(len(ids))), "shard ids not contiguous in bucket"
    for toks in load_per_shard.values():
        assert sum(toks) < _SHARD_CAPACITY + max(toks)


def test_epoch_shuffle_is_reproducible_permutation(spark, sf_dir):
    """llm_epoch_shuffle invariants: per epoch, global_pos is exactly the
    permutation 0..n-1; epochs produce DIFFERENT orders (the salt works);
    bucket regions are contiguous in bucket order (the two-level total
    order really is an order); and a re-run is bit-identical
    (reproducibility is the whole point)."""
    from collections import defaultdict

    from sig_etl_spark.queries.llm_text import _SHUF_EPOCHS, llm_epoch_shuffle

    rows = llm_epoch_shuffle(spark, sf_dir).collect()
    again = llm_epoch_shuffle(spark, sf_dir).collect()
    key = lambda r: (r.epoch, r.doc_id)  # noqa: E731
    assert {key(r): r.global_pos for r in rows} == {
        key(r): r.global_pos for r in again
    }

    by_epoch = defaultdict(list)
    for r in rows:
        by_epoch[r.epoch].append(r)
    assert len(by_epoch) == _SHUF_EPOCHS
    orders = {}
    for ep, rs in by_epoch.items():
        n = len(rs)
        assert sorted(r.global_pos for r in rs) == list(range(n))
        # bucket regions contiguous and in bucket order
        span = defaultdict(list)
        for r in rs:
            span[r.bucket].append(r.global_pos)
        lo_hi = {b: (min(v), max(v)) for b, v in span.items()}
        cursor = 0
        for b in sorted(lo_hi):
            lo, hi = lo_hi[b]
            assert lo == cursor and hi - lo + 1 == len(span[b])
            cursor = hi + 1
        orders[ep] = [r.doc_id for r in sorted(rs, key=lambda r: r.global_pos)]
    eps = sorted(orders)
    for a, b in zip(eps, eps[1:]):
        assert orders[a] != orders[b], "epoch salt produced identical orders"


def test_waterfill_pivot_matches_python_reference(spark):
    """Randomized pinning of the waterfill pivot math: crafted corpora
    (seeded token counts, curated/crawl mix, zero-token sources, cap
    ties) through the REAL Spark frame must match a 15-line pure-Python
    waterfill on every allocation — the closed-form pivot selection is
    the trickiest integer math in the round and the oracle only covers
    one corpus shape."""
    import random

    from sig_etl_spark.queries.llm_text import _WF_CURATED, waterfill_frame

    def py_waterfill(caps: dict[str, int], budget: int) -> dict[str, int]:
        # independent reference: raise the level until the budget fills
        order = sorted(caps, key=lambda s: (caps[s], s))
        sat: list[str] = []
        for j in range(len(order) + 1):
            presum = sum(caps[s] for s in order[:j])
            rest = order[j:]
            if not rest:
                return dict(caps) if budget >= presum else {}
            lam = (budget - presum) // len(rest) if budget >= presum else -1
            if (j == 0 or caps[order[j - 1]] <= lam) and caps[rest[0]] > lam:
                return {s: min(caps[s], lam) for s in caps}
        raise AssertionError("no pivot found")

    rng = random.Random(11)
    for trial in range(6):
        n_sources = rng.randint(3, 12)
        rows = []
        counts = {}
        for i in range(n_sources):
            name = f"src{i}"
            # whole documents of single-token words; a few zero-token srcs
            c = rng.choice([0, rng.randint(1, 40), rng.randint(40, 200)])
            counts[name] = c
            rows.append((i, name, " ".join(["w"] * c) if c else ""))
        docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
        got = {r.source: r for r in waterfill_frame(docs).collect()}
        caps = {
            s: 2 * c if s in _WF_CURATED else c // 2 for s, c in counts.items()
        }
        budget = sum(counts.values()) * 3 // 5
        want = py_waterfill(caps, budget)
        assert want, f"trial {trial}: python reference found no pivot"
        assert {s: r.alloc_tokens for s, r in got.items()} == want, (
            trial, counts, budget,
            {s: (r.cap_tokens, r.alloc_tokens) for s, r in got.items()}, want,
        )
        for s, r in got.items():
            assert r.cap_tokens == caps[s]
            assert r.saturated == (1 if r.alloc_tokens == r.cap_tokens else 0)


def test_bestfit_packing_beats_nextfit_waste(spark, sf_dir):
    """VERDICT r12 task 6 'Done' criterion: best-fit-decreasing packing
    must (a) respect capacity on every shard, and (b) strand strictly
    less total padding than the bin-respecting reading of the
    running-sum packers — next-fit in the same md5 hash order — on the
    same fixture, same buckets, same capacity."""
    import hashlib
    from collections import defaultdict

    from sig_etl_spark.queries.llm_text import _BF_CAPACITY, pack_shards_bestfit
    from sig_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    per_doc = pack_shards_bestfit(docs).collect()

    loads: dict[tuple, int] = defaultdict(int)
    for r in per_doc:
        loads[(r.source, r.bucket, r.shard_id)] += r.n_tokens
    assert all(v <= _BF_CAPACITY for v in loads.values()), (
        "a multi-doc shard exceeds capacity"
    )
    bf_waste = sum(_BF_CAPACITY - v for v in loads.values())

    groups: dict[tuple, list] = defaultdict(list)
    for r in per_doc:
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        groups[(r.source, r.bucket)].append((h, r.doc_id, r.n_tokens))
    nf_shards = 0
    nf_total = 0
    for docs_in_group in groups.values():
        docs_in_group.sort()
        fill = 0
        nf_shards += 1
        for _, _, n in docs_in_group:
            if fill + n > _BF_CAPACITY and fill > 0:
                nf_shards += 1
                fill = 0
            fill += n
            nf_total += n
    nf_waste = nf_shards * _BF_CAPACITY - nf_total

    assert sum(r.n_tokens for r in per_doc) == nf_total
    assert bf_waste < nf_waste, (bf_waste, nf_waste)
