"""Name parsing (SURVEY.md F1/F2).

The reference parses scraped legislator names in two flavors:

- F1 (/root/reference/votervoice/transform.py:13-55): strip honorific
  titles, parentheticals and suffixes, drop a middle initial, split
  first/last.
- F2 (/root/reference/national/_1034/transform.py:95-144): unicode fold,
  strip a quoted/parenthesized nickname, then handle both ``Last, First``
  and ``First Last`` orderings.

Here each step is a pure column expression so Catalyst can fold the whole
parse into one codegen stage; `parse_name` composes them into the five
identity columns the reference emits (firstname, middlename, lastname,
suffix, nickname).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Honorific titles the reference strips from the head of a name.
HONORIFICS = (
    "Representative",
    "Rep",
    "Senator",
    "Sen",
    "Speaker",
    "President",
    "Governor",
    "Gov",
    "Delegate",
    "Del",
    "Hon",
    "Dr",
    "Mr",
    "Mrs",
    "Ms",
)

# Name suffixes pulled out as their own column.
SUFFIXES = ("Jr", "Sr", "II", "III", "IV", "V", "MD", "DDS", "PhD", "Esq")

_HONORIFIC_PAT = r"^(?:(?:" + "|".join(HONORIFICS) + r")\.?\s+)+"
_SUFFIX_PAT = r",?\s+(" + "|".join(SUFFIXES) + r")\.?\s*$"
_NICK_QUOTED_PAT = r'"([^"]*)"'
_NICK_PAREN_PAT = r"\(([^)]*)\)"


def strip_honorifics(c: Column) -> Column:
    """Remove leading titles: ``Rep. John Smith`` -> ``John Smith``."""
    return F.regexp_replace(c, _HONORIFIC_PAT, "")


def strip_parenthetical(c: Column) -> Column:
    """Remove any ``(...)`` group (party tags, nicknames in parens)."""
    return F.trim(F.regexp_replace(c, r"\s*\([^)]*\)", ""))


def extract_suffix(c: Column) -> Column:
    """Pull a trailing generational/degree suffix, '' when absent."""
    return F.regexp_extract(c, _SUFFIX_PAT, 1)


def strip_suffix(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, _SUFFIX_PAT, ""))


def extract_nickname(c: Column) -> Column:
    """Quoted or parenthesized nickname: ``Robert "Bob" Smith`` -> ``Bob``."""
    quoted = F.regexp_extract(c, _NICK_QUOTED_PAT, 1)
    paren = F.regexp_extract(c, _NICK_PAREN_PAT, 1)
    return F.when(quoted != "", quoted).otherwise(paren)


def strip_nickname(c: Column) -> Column:
    c = F.regexp_replace(c, r'\s*"[^"]*"', "")
    c = F.regexp_replace(c, r"\s*\([^)]*\)", "")
    return F.trim(c)


def _squash_ws(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def parse_name(c: Column) -> dict[str, Column]:
    """Full name -> {firstname, middlename, lastname, suffix, nickname}.

    Handles both orderings the reference sees:
    ``Last, First [Middle]`` (comma form, F2) and
    ``[Title.] First [Middle] Last [, Suffix]`` (F1), with quoted or
    parenthesized nicknames removed first.

    Middle initials (single letter, optional dot) become ``middlename``;
    multi-token middles keep all interior tokens joined by spaces.
    """
    nickname = extract_nickname(c)
    base = strip_honorifics(strip_nickname(c))
    suffix = extract_suffix(base)
    base = _squash_ws(strip_suffix(base))

    is_comma = base.contains(",")
    # "Last, First Middle" — try_element_at (1-based) stays null-on-missing
    # under ANSI; the when(is_comma, ...) guard is belt, this is suspenders.
    comma_last = F.trim(F.try_element_at(F.split(base, ","), F.lit(1)))
    comma_rest = _squash_ws(F.try_element_at(F.split(base, ","), F.lit(2)))
    # "First Middle... Last"
    toks = F.split(base, " ")
    n = F.size(toks)

    first = F.when(
        is_comma, F.try_element_at(F.split(comma_rest, " "), F.lit(1))
    ).otherwise(F.try_element_at(toks, F.lit(1)))
    last = F.when(is_comma, comma_last).otherwise(F.element_at(toks, -1))
    middle = F.when(
        is_comma,
        F.array_join(F.slice(F.split(comma_rest, " "), 2, 100), " "),
    ).otherwise(
        F.when(n > 2, F.array_join(F.slice(toks, 2, n - 2), " ")).otherwise(F.lit(""))
    )
    # Normalize a bare initial "A." -> "A"
    middle = F.regexp_replace(middle, r"^([A-Za-z])\.$", "$1")
    return {
        "firstname": first,
        "middlename": middle,
        "lastname": last,
        "suffix": suffix,
        "nickname": nickname,
    }
