"""Oracle-checked queries exercising the F-series function library.

Each query *constructs* messy input strings deterministically from the
TPC-H tables (identically in Spark and DuckDB), then parses them with the
engine's functions on the Spark side and equivalent ANSI SQL on the oracle
side — so the hash comparison checks the parse semantics, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sig_etl_spark.functions import (
    fold_ascii,
    glyph_translate,
    good_bad_pct,
    key_value_map,
    normalize_via_map,
    parse_name,
    parse_party_state_district,
    url_tail_id,
)
from sig_etl_spark.functions.dates import parse_long_date
from sig_etl_spark.functions.text import parse_election_location
from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

# ---------------------------------------------------------------------------
# F1+F2: the name parser over synthesized honorific/comma/nickname/suffix
# variants. Reference: votervoice/transform.py:13-55;
# national/_1034/transform.py:95-144.
# ---------------------------------------------------------------------------

_NAME_ORACLE = r"""
WITH src AS (
  SELECT c.c_custkey,
         regexp_replace(lower(n.n_name), '[^a-z]', '', 'g') AS ln,
         c.c_custkey % 5 AS v
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
named AS (
  SELECT c_custkey,
         CASE v
           WHEN 0 THEN 'Rep. Alice M. ' || ln || ' Jr.'
           WHEN 1 THEN ln || ', Maria Q.'
           WHEN 2 THEN 'Dr. Robert "Bob" ' || ln
           WHEN 3 THEN 'Sen. Jane ' || ln || ', III'
           ELSE 'Carlos ' || ln
         END AS full_name
  FROM src
),
s1 AS (
  SELECT c_custkey, full_name,
         regexp_extract(full_name, '"([^"]*)"', 1) AS nick_q,
         regexp_extract(full_name, '\(([^)]*)\)', 1) AS nick_p,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(full_name, '\s*"[^"]*"', '', 'g'),
             '\s*\([^)]*\)', '', 'g'),
           '^((?:Representative|Rep|Senator|Sen|Speaker|President|Governor|Gov|Delegate|Del|Hon|Dr|Mr|Mrs|Ms)\.?\s+)+',
           '')) AS base0
  FROM named
),
s2 AS (
  SELECT c_custkey, full_name,
         CASE WHEN nick_q <> '' THEN nick_q ELSE nick_p END AS nickname,
         regexp_extract(base0, ',?\s+(Jr|Sr|II|III|IV|V|MD|DDS|PhD|Esq)\.?\s*$', 1) AS suffix,
         trim(regexp_replace(
           regexp_replace(base0, ',?\s+(Jr|Sr|II|III|IV|V|MD|DDS|PhD|Esq)\.?\s*$', ''),
           '\s+', ' ', 'g')) AS base
  FROM s1
),
s3 AS (
  SELECT *, (base LIKE '%,%') AS is_comma,
         trim(split_part(base, ',', 1)) AS comma_last,
         trim(regexp_replace(split_part(base, ',', 2), '\s+', ' ', 'g')) AS comma_rest,
         string_split(base, ' ') AS toks
  FROM s2
)
SELECT c_custkey, full_name,
       CASE WHEN is_comma THEN split_part(comma_rest, ' ', 1)
            ELSE toks[1] END AS firstname,
       regexp_replace(
         CASE WHEN is_comma
              THEN array_to_string(string_split(comma_rest, ' ')[2:], ' ')
              WHEN len(toks) > 2
              THEN array_to_string(toks[2:len(toks)-1], ' ')
              ELSE '' END,
         '^([A-Za-z])\.$', '\1') AS middlename,
       CASE WHEN is_comma THEN comma_last ELSE toks[len(toks)] END AS lastname,
       suffix, nickname
FROM s3
"""


@register(
    "f_parse_names",
    oracle=_NAME_ORACLE,
    doc="F1+F2: honorific/suffix/nickname strip + comma-form name split",
)
def f_parse_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ln = F.regexp_replace(F.lower(F.col("n_name")), "[^a-z]", "")
    v = F.col("c_custkey") % 5
    full = (
        F.when(v == 0, F.concat(F.lit("Rep. Alice M. "), ln, F.lit(" Jr.")))
        .when(v == 1, F.concat(ln, F.lit(", Maria Q.")))
        .when(v == 2, F.concat(F.lit('Dr. Robert "Bob" '), ln))
        .when(v == 3, F.concat(F.lit("Sen. Jane "), ln, F.lit(", III")))
        .otherwise(F.concat(F.lit("Carlos "), ln))
    )
    df = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", full.alias("full_name"))
    )
    parts = parse_name(F.col("full_name"))
    return df.select(
        "c_custkey",
        "full_name",
        parts["firstname"].alias("firstname"),
        parts["middlename"].alias("middlename"),
        parts["lastname"].alias("lastname"),
        parts["suffix"].alias("suffix"),
        parts["nickname"].alias("nickname"),
    )


# ---------------------------------------------------------------------------
# F3+F4+F5: party-state-district tag parse, zero-strip, normalization map.
# Reference: votervoice/transform.py:58-68 (F3), :63-66 (F4), :7-10,88 (F5).
# ---------------------------------------------------------------------------

_PSD_ORACLE = r"""
WITH src AS (
  SELECT c.c_custkey,
         upper(substr(regexp_replace(lower(n.n_name), '[^a-z]', '', 'g') || 'xx', 1, 2)) AS st,
         CASE c.c_custkey % 3 WHEN 0 THEN 'R' WHEN 1 THEN 'D' ELSE 'I' END AS p,
         c.c_custkey % 25 AS d
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
tagged AS (
  SELECT c_custkey,
         CASE WHEN d = 0 THEN 'Delegate Pat Doe (' || p || '-' || st || ')'
              ELSE 'Pat Doe (' || p || '-' || st || '-' || lpad(CAST(d AS VARCHAR), 3, '0') || ')'
         END AS info
  FROM src
)
SELECT c_custkey, info,
       CASE regexp_extract(info, '\(([A-Za-z]+)-([A-Z]{2})(?:-([0-9A-Za-z]+))?\)', 1)
            WHEN 'R' THEN 'Republican' WHEN 'D' THEN 'Democratic'
            WHEN 'I' THEN 'Independent'
            ELSE regexp_extract(info, '\(([A-Za-z]+)-([A-Z]{2})(?:-([0-9A-Za-z]+))?\)', 1)
       END AS party,
       regexp_extract(info, '\(([A-Za-z]+)-([A-Z]{2})(?:-([0-9A-Za-z]+))?\)', 2) AS state_id,
       regexp_replace(
         regexp_extract(info, '\(([A-Za-z]+)-([A-Z]{2})(?:-([0-9A-Za-z]+))?\)', 3),
         '^0+', '') AS district,
       (info LIKE 'Delegate%') AS is_delegate
FROM tagged
"""


@register(
    "f_party_state_district",
    oracle=_PSD_ORACLE,
    doc="F3+F4+F5+P7: tag regex parse, zero-strip district, party normalize",
)
def f_party_state_district(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ln = F.regexp_replace(F.lower(F.col("n_name")), "[^a-z]", "")
    st = F.upper(F.substring(F.concat(ln, F.lit("xx")), 1, 2))
    p = (
        F.when(F.col("c_custkey") % 3 == 0, F.lit("R"))
        .when(F.col("c_custkey") % 3 == 1, F.lit("D"))
        .otherwise(F.lit("I"))
    )
    d = F.col("c_custkey") % 25
    info = F.when(
        d == 0, F.concat(F.lit("Delegate Pat Doe ("), p, F.lit("-"), st, F.lit(")"))
    ).otherwise(
        F.concat(
            F.lit("Pat Doe ("), p, F.lit("-"), st, F.lit("-"),
            F.lpad(d.cast("string"), 3, "0"), F.lit(")"),
        )
    )
    df = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", info.alias("info"))
    psd = parse_party_state_district(F.col("info"))
    return df.select(
        "c_custkey",
        "info",
        normalize_via_map(
            psd["party"], {"R": "Republican", "D": "Democratic", "I": "Independent"}
        ).alias("party"),
        psd["state_id"].alias("state_id"),
        psd["district"].alias("district"),
        F.col("info").rlike("^Delegate").alias("is_delegate"),
    )


# ---------------------------------------------------------------------------
# F8: long-form date parse with invalid -> null.
# Reference: national/_1034/transform.py:186-209.
# ---------------------------------------------------------------------------

_DATE_ORACLE = r"""
WITH raws AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'not a date'
              ELSE strftime(o_orderdate, '%B %-d,%Y') END AS raw_date
  FROM orders
)
SELECT o_orderkey, raw_date,
       strftime(try_strptime(raw_date, '%B %d,%Y'), '%Y-%m-%d') AS parsed
FROM raws
"""


@register(
    "f_long_dates",
    oracle=_DATE_ORACLE,
    doc="F8: 'November 5,2024'-style parse, null on invalid",
)
def f_long_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    raw = F.when(F.col("o_orderkey") % 7 == 0, F.lit("not a date")).otherwise(
        F.date_format(F.col("o_orderdate"), "MMMM d,yyyy")
    )
    # Emit ISO strings (not DATE) so the hash compare is type-agnostic.
    return orders.select("o_orderkey", raw.alias("raw_date")).withColumn(
        "parsed", F.date_format(parse_long_date(F.col("raw_date")), "yyyy-MM-dd")
    )


# ---------------------------------------------------------------------------
# F9+A1+A2: per-order vote string + conditional counts + guarded pct.
# Reference: votervoice/extract.py:21-28,37-50; national/_125/extract.py:41-68.
# ---------------------------------------------------------------------------

_VOTES_ORACLE = r"""
SELECT l_orderkey,
       string_agg(translate(l_returnflag, 'NRA', '+-*'), ''
                  ORDER BY l_linenumber, l_returnflag) AS vote_string,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS good,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS bad,
       CASE WHEN SUM(CASE WHEN l_returnflag IN ('N','R') THEN 1 ELSE 0 END) = 0 THEN 0.0
            ELSE ROUND(100.0 * SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                       / SUM(CASE WHEN l_returnflag IN ('N','R') THEN 1 ELSE 0 END), 2)
       END AS good_pct
FROM lineitem
GROUP BY l_orderkey
"""


@register(
    "f_vote_string",
    oracle=_VOTES_ORACLE,
    doc="F9+A1+A2: ordered glyph translation + conditional counts per order",
)
def f_vote_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ordered = F.array_sort(F.collect_list(F.struct("l_linenumber", "l_returnflag")))
    flags = F.transform(ordered, lambda x: x["l_returnflag"])
    good = F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
    bad = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    return li.groupBy("l_orderkey").agg(
        glyph_translate(flags, {"N": "+", "R": "-", "A": "*"}).alias("vote_string"),
        good.alias("good"),
        bad.alias("bad"),
        good_bad_pct(good, bad).alias("good_pct"),
    )


# ---------------------------------------------------------------------------
# F10+F11+F12+F13: trim/case, URL-tail id, key:value destructure, accent fold.
# Reference: national/_1034/transform.py:224-236 (F10);
# billtrack50_app/extract.py:91-92 (F11); national/_1985/extract.py:30-41
# (F12); national/_1034/transform.py:110 (F13).
# ---------------------------------------------------------------------------

_TEXT_ORACLE = r"""
WITH src AS (
  SELECT s_suppkey,
         'https://site.example/people/cand-' || CAST(s_suppkey AS VARCHAR) || '?tab=1' AS url,
         'Economy: ' || CAST(s_suppkey % 100 AS VARCHAR) || '; Taxes : ' ||
             CAST(s_suppkey % 50 AS VARCHAR) AS kv,
         'José ' || s_name || ' Ñuñez' AS accented,
         '  ' || upper(s_name) || '  ' AS padded
  FROM supplier
)
SELECT s_suppkey,
       regexp_extract(url, '/([^/?#]+)/?(?:[?#].*)?$', 1) AS sig_candidate_id,
       strip_accents(accented) AS folded,
       lower(trim(padded)) AS cleaned,
       regexp_extract(kv, 'Economy\s*:\s*([0-9]+)', 1) AS economy_score,
       regexp_extract(kv, 'Taxes\s*:\s*([0-9]+)', 1) AS taxes_score
FROM src
"""


@register(
    "f_text_misc",
    oracle=_TEXT_ORACLE,
    doc="F10-F13: url-id, accent fold, trim/case, key:value destructure",
)
def f_text_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    url = F.concat(
        F.lit("https://site.example/people/cand-"),
        F.col("s_suppkey").cast("string"),
        F.lit("?tab=1"),
    )
    kv = F.concat(
        F.lit("Economy: "),
        (F.col("s_suppkey") % 100).cast("string"),
        F.lit("; Taxes : "),
        (F.col("s_suppkey") % 50).cast("string"),
    )
    accented = F.concat(F.lit("José "), F.col("s_name"), F.lit(" Ñuñez"))
    padded = F.concat(F.lit("  "), F.upper(F.col("s_name")), F.lit("  "))
    kvmap = key_value_map(kv)
    return supplier.select(
        "s_suppkey",
        url_tail_id(url).alias("sig_candidate_id"),
        fold_ascii(accented).alias("folded"),
        F.lower(F.trim(padded)).alias("cleaned"),
        F.try_element_at(kvmap, F.lit("Economy")).alias("economy_score"),
        F.try_element_at(kvmap, F.lit("Taxes")).alias("taxes_score"),
    )


# ---------------------------------------------------------------------------
# F6: election-location parser — split ' - ', extract district number,
# remove structural stop-words.
# Reference: national/_1034/transform.py:159-183.
# ---------------------------------------------------------------------------

_LOCATION_ORACLE = r"""
WITH src AS (
  SELECT c.c_custkey,
         CASE c.c_custkey % 4
           WHEN 0 THEN n.n_name || ' - District ' ||
                       lpad(CAST(c.c_custkey % 40 AS VARCHAR), 2, '0') || ' Congressional'
           WHEN 1 THEN n.n_name || ' - At-Large'
           WHEN 2 THEN n.n_name || ' - Ward ' || CAST(c.c_custkey % 9 AS VARCHAR) || ' County'
           ELSE n.n_name
         END AS raw_location
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT c_custkey, raw_location,
       trim(split_part(raw_location, ' - ', 1)) AS location,
       regexp_replace(regexp_extract(coalesce(nullif(split_part(raw_location, ' - ', 2), ''), ''),
                                     '([0-9]+)', 1), '^0+', '') AS district,
       trim(regexp_replace(
         trim(regexp_replace(
           regexp_replace(coalesce(nullif(split_part(raw_location, ' - ', 2), ''), ''),
                          '\b(District|Congressional|County|Ward|At-Large)\b', '', 'g'),
           '\s+', ' ', 'g')),
         '[0-9]+', '', 'g')) AS location_extra
FROM src
"""


@register(
    "f_election_location",
    oracle=_LOCATION_ORACLE,
    doc="F6: ' - ' split, district number extraction, stop-word removal",
)
def f_election_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    v = F.col("c_custkey") % 4
    raw = (
        F.when(
            v == 0,
            F.concat(
                F.col("n_name"), F.lit(" - District "),
                F.lpad((F.col("c_custkey") % 40).cast("string"), 2, "0"),
                F.lit(" Congressional"),
            ),
        )
        .when(v == 1, F.concat(F.col("n_name"), F.lit(" - At-Large")))
        .when(
            v == 2,
            F.concat(
                F.col("n_name"), F.lit(" - Ward "),
                (F.col("c_custkey") % 9).cast("string"), F.lit(" County"),
            ),
        )
        .otherwise(F.col("n_name"))
    )
    df = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", raw.alias("raw_location"))
    loc = parse_election_location(F.col("raw_location"))
    return df.select(
        "c_custkey",
        "raw_location",
        loc["location"].alias("location"),
        loc["district"].alias("district"),
        loc["location_extra"].alias("location_extra"),
    )
