"""Text utilities (SURVEY.md F3/F4/F5/F10/F11/F12/F13).

All pure column expressions — no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

# F3: "(R-TX-07)" style tags -> party/state/district.
# Reference: /root/reference/votervoice/transform.py:58-68 (named-group regex).
_PSD_PAT = r"\(([A-Za-z]+)-([A-Z]{2})(?:-([0-9A-Za-z]+))?\)"


def parse_party_state_district(c: Column) -> dict[str, Column]:
    return {
        "party": F.regexp_extract(c, _PSD_PAT, 1),
        "state_id": F.regexp_extract(c, _PSD_PAT, 2),
        "district": strip_leading_zeros(F.regexp_extract(c, _PSD_PAT, 3)),
    }


def strip_leading_zeros(c: Column) -> Column:
    """F4: '007' -> '7', '000' -> '' (the reference's lstrip('0')).

    Reference: /root/reference/votervoice/transform.py:63-66.
    """
    return F.regexp_replace(c, r"^0+", "")


def normalize_via_map(c: Column, mapping: Mapping[str, str]) -> Column:
    """F5: canonicalize values through a small dictionary; unmapped pass
    through unchanged.

    Reference: /root/reference/votervoice/transform.py:7-10,88 and
    /root/reference/national/_1034/transform.py:9-52,244.

    Implemented as a literal MAP lookup + coalesce — Catalyst constant-folds
    the map; no join, no UDF. For dictionaries too big to inline, use a
    broadcast join instead (see linkage module). ``try_element_at`` keeps the
    unmapped-key pass-through contract under ANSI mode (plain ``element_at``
    throws MAP_KEY_DOES_NOT_EXIST there).
    """
    if not mapping:
        return c
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.coalesce(F.try_element_at(F.create_map(*pairs), c), c)


def url_tail_id(c: Column) -> Column:
    """F11: surrogate id = last path segment of a URL.

    Reference: /root/reference/billtrack50_app/extract.py:91-92.
    """
    return F.regexp_extract(c, r"/([^/?#]+)/?(?:[?#].*)?$", 1)


def key_value_map(c: Column, pair_sep: str = ";", kv_sep: str = ":") -> Column:
    """F12: "Economy: 85; Taxes: 70" -> map{'Economy':'85','Taxes':'70'}.

    Reference: /root/reference/national/_1985/extract.py:30-41.
    """
    pairs = F.filter(F.split(c, pair_sep), lambda p: F.trim(p) != "")
    # try_element_at (1-based): a separator-less pair yields value=null
    # instead of INVALID_ARRAY_INDEX under ANSI mode.
    entries = F.transform(
        pairs,
        lambda p: F.struct(
            F.trim(F.try_element_at(F.split(p, kv_sep), F.lit(1))).alias("key"),
            F.trim(F.try_element_at(F.split(p, kv_sep), F.lit(2))).alias("value"),
        ),
    )
    return F.map_from_entries(entries)


# F6: election-location parser. Reference: /root/reference/national/_1034/
# transform.py:159-183 — split "Location - District ..." on ' - ', pull the
# numeric district, drop structural stop-words from the remainder.
_LOCATION_STOPWORDS = ("District", "Congressional", "County", "Ward", "At-Large")


def parse_election_location(c: Column) -> dict[str, Column]:
    parts = F.split(c, " - ")
    location = F.trim(F.try_element_at(parts, F.lit(1)))
    rest = F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit(""))
    district = F.regexp_extract(rest, r"([0-9]+)", 1)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(rest, r"\b(" + "|".join(_LOCATION_STOPWORDS) + r")\b", ""),
            r"\s+",
            " ",
        )
    )
    return {
        "location": location,
        "district": strip_leading_zeros(district),
        "location_extra": F.trim(F.regexp_replace(cleaned, r"[0-9]+", "")),
    }


# F13: unicode fold. The reference calls unidecode()
# (/root/reference/national/_1034/transform.py:110); for the Latin-1
# accent range a translate() covers it JVM-side with no UDF. The FULL
# transliteration tier (gated unidecode / NFKD Arrow UDF) is
# functions/translit.py:fold_ascii_full — reserve it for data that
# actually exceeds this table; this stays the codegen default.
_ACCENTS_SRC = "áàâäãåāéèêëēíìîïīóòôöõøōúùûüūçñýÿÁÀÂÄÃÅĀÉÈÊËĒÍÌÎÏĪÓÒÔÖÕØŌÚÙÛÜŪÇÑÝ"
_ACCENTS_DST = "aaaaaaaeeeeeiiiiiooooooouuuuucnyyAAAAAAAEEEEEIIIIIOOOOOOOUUUUUCNY"


def fold_ascii(c: Column) -> Column:
    return F.translate(c, _ACCENTS_SRC, _ACCENTS_DST)
