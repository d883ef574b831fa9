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
