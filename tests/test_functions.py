"""Table-driven unit tests for the F-series function library (SURVEY §5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sig_etl_spark.functions import (
    fold_ascii,
    glyph_translate,
    good_bad_pct,
    key_value_map,
    normalize_via_map,
    parse_name,
    parse_party_state_district,
    strip_leading_zeros,
    url_tail_id,
    vote_index,
)
from sig_etl_spark.functions.dates import parse_long_date


def one_row(spark, **cols):
    return spark.createDataFrame([tuple(cols.values())], list(cols.keys()))


NAME_CASES = [
    # raw, first, middle, last, suffix, nickname
    ("Rep. John Smith", "John", "", "Smith", "", ""),
    ("Sen. Mary Q. Public, Jr.", "Mary", "Q", "Public", "Jr", ""),
    ('Robert "Bob" Jones', "Robert", "", "Jones", "", "Bob"),
    ("Smith, John", "John", "", "Smith", "", ""),
    ("Smith, John A.", "John", "A", "Smith", "", ""),
    ("Van Der Berg, Anna", "Anna", "", "Van Der Berg", "", ""),
    ("Dr. Jane Roe III", "Jane", "", "Roe", "III", ""),
    ("Speaker Nancy Smith", "Nancy", "", "Smith", "", ""),
    ("John Jacob Jingleheimer Schmidt", "John", "Jacob Jingleheimer", "Schmidt", "", ""),
]


@pytest.mark.parametrize("raw,first,middle,last,suffix,nick", NAME_CASES)
def test_parse_name(spark, raw, first, middle, last, suffix, nick):
    df = one_row(spark, raw=raw)
    parts = parse_name(F.col("raw"))
    row = df.select(
        parts["firstname"].alias("f"),
        parts["middlename"].alias("m"),
        parts["lastname"].alias("l"),
        parts["suffix"].alias("s"),
        parts["nickname"].alias("n"),
    ).first()
    assert (row.f, row.m, row.l, row.s, row.n) == (first, middle, last, suffix, nick)


PSD_CASES = [
    ("Jane Doe (R-TX-07)", "R", "TX", "7"),
    ("Jane Doe (D-CA)", "D", "CA", ""),
    ("John Roe (Ind-NY-001)", "Ind", "NY", "1"),
    ("no tag here", "", "", ""),
]


@pytest.mark.parametrize("raw,party,state,district", PSD_CASES)
def test_party_state_district(spark, raw, party, state, district):
    df = one_row(spark, raw=raw)
    psd = parse_party_state_district(F.col("raw"))
    row = df.select(
        psd["party"].alias("p"), psd["state_id"].alias("s"), psd["district"].alias("d")
    ).first()
    assert (row.p, row.s, row.d) == (party, state, district)


DATE_CASES = [
    ("November 5,2024", "2024-11-05"),
    ("March 14,1999", "1999-03-14"),
    (" July 4,1776 ", "1776-07-04"),
    ("not a date", None),
    ("February 30,2024", None),
]


@pytest.mark.parametrize("raw,expected", DATE_CASES)
def test_parse_long_date(spark, raw, expected):
    row = (
        one_row(spark, raw=raw)
        .select(F.date_format(parse_long_date(F.col("raw")), "yyyy-MM-dd").alias("d"))
        .first()
    )
    assert row.d == expected


def test_glyph_translate_and_scores(spark):
    df = spark.createDataFrame([(["Y", "N", "?", "Y"],)], ["votes"])
    row = df.select(
        glyph_translate(F.col("votes"), {"Y": "+", "N": "-"}).alias("s")
    ).first()
    assert row.s == "+-*+"
    scored = spark.createDataFrame([(3.0, 1.0), (0.0, 0.0)], ["good", "bad"]).select(
        good_bad_pct(F.col("good"), F.col("bad")).alias("pct")
    )
    assert [r.pct for r in scored.collect()] == [75.0, 0.0]
    vi = spark.createDataFrame([(5.0, 10.0), (1.0, 0.0)], ["total", "possible"]).select(
        vote_index(F.col("total"), F.col("possible")).alias("vi")
    )
    assert [r.vi for r in vi.collect()] == [75.0, None]


def test_text_helpers(spark):
    df = one_row(
        spark,
        url="https://x.example/people/cand-42?tab=1",
        kv="Economy: 85; Taxes : 70",
        acc="José Ñuñez",
        z="00042",
        party="R",
    )
    row = df.select(
        url_tail_id(F.col("url")).alias("u"),
        F.element_at(key_value_map(F.col("kv")), "Taxes").alias("t"),
        fold_ascii(F.col("acc")).alias("a"),
        strip_leading_zeros(F.col("z")).alias("z2"),
        normalize_via_map(F.col("party"), {"R": "Republican"}).alias("p"),
        normalize_via_map(F.lit("unmapped"), {"R": "Republican"}).alias("pm"),
    ).first()
    assert row.u == "cand-42"
    assert row.t == "70"
    assert row.a == "Jose Nunez"
    assert row.z2 == "42"
    assert row.p == "Republican"
    assert row.pm == "unmapped"


# --- F13 full-transliteration tier (functions/translit.py, r8) -------------

# ADVICE r8: the em-dash golden depends on the tier — real unidecode
# (the advertised exact-parity tier) folds '—' to '--' while the NFKD
# fallback maps it to '-'. Branch the expectation on which tier is live
# so installing the optional package doesn't break the suite.
from sig_etl_spark.functions import translit as _translit

_EMDASH = "-" if _translit._unidecode is None else "--"

_GOLDEN_FOLDS = [
    # accented/nickname shapes from the reference's roster data
    ("José Ñuñez", "Jose Nunez"),
    ("Renée O'Connor-Báez", "Renee O'Connor-Baez"),
    ("François Lefèvre", "Francois Lefevre"),
    ("Åsa Sjögren", "Asa Sjogren"),
    ("Đorđe Čolić", "Dorde Colic"),
    ("Łukasz Wróblewski", "Lukasz Wroblewski"),
    ("Þórður Guðmundsson", "Thordur Gudmundsson"),
    ("Jean-Cœur d'Alène", "Jean-Coeur d'Alene"),
    ("Strauß", "Strauss"),
    ("El Niño — “quoted”", f"El Nino {_EMDASH} \"quoted\""),
    (None, None),
    ("plain ascii stays", "plain ascii stays"),
]


def test_fold_ascii_py_golden():
    from sig_etl_spark.functions import fold_ascii_py

    for raw, want in _GOLDEN_FOLDS:
        assert fold_ascii_py(raw) == want, (raw, fold_ascii_py(raw))


def test_fold_ascii_full_udf_matches_py(spark):
    """The Arrow tier must agree with the pure-Python fold row-for-row,
    and with the JVM translate() default on the accent-table range."""
    from sig_etl_spark.functions import fold_ascii_full, fold_ascii_py

    rows = [(i, s) for i, (s, _) in enumerate(_GOLDEN_FOLDS)]
    df = spark.createDataFrame(rows, ["i", "s"])
    got = {
        r.i: r.f
        for r in df.select("i", fold_ascii_full(F.col("s")).alias("f")).collect()
    }
    for i, (raw, want) in enumerate(_GOLDEN_FOLDS):
        assert got[i] == want == fold_ascii_py(raw)
    # JVM default and full tier agree wherever the fixed table applies
    jvm = {
        r.i: r.f
        for r in df.select("i", fold_ascii(F.col("s")).alias("f")).collect()
    }
    assert jvm[0] == got[0] == "Jose Nunez"
