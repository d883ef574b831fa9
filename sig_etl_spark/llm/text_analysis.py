"""Text-analysis operators for training-data pipelines.

Everything here is a pure column expression (JVM-side, codegen-friendly) —
token counting, quality scoring, language-ID heuristics, and document
fingerprinting all run inside whole-stage codegen with zero Python in the
hot path. At 100 TB this matters more than anywhere else: these ops run
over every document, so a per-row Python UDF would dominate the job.

The reference's F-series parsers (SURVEY.md §2.3) are the spiritual
ancestors: same strip/split/derive moves, applied to documents instead of
scraped legislator rows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish pre-tokenization regex: letter runs, digit runs, or single
# punctuation marks (GPT-2-style pre-tokenizer shape, ASCII-simplified).
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Tiny common-word sets per language for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "es": ("el", "la", "que", "y", "en", "los"),
    "fr": ("le", "la", "et", "les", "des", "une"),
}

EN_STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")


def tokens(c: Column) -> Column:
    """Whitespace tokenization -> ARRAY<STRING> (empty tokens dropped)."""
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_segments(toks: Column, g: int) -> Column:
    """Non-overlapping ``g``-token segments of a token array, in order:
    ``array_join(slice(toks, s+1, g), ' ')`` for s in 0, g, 2g, ...

    THE segmentation arithmetic shared by the batch boilerplate scrub
    (queries/llm_text.scrub_frame), the static segment miner and the
    streaming scrub (streaming/pipeline) — one point of change, so the
    bit-exact batch/stream scrub equality cannot drift (the
    _BPE_MERGE_CTE lesson applied to column expressions)."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(g)),
        lambda s: F.array_join(F.slice(toks, s + 1, F.lit(g)), " "),
    )


def bind(c: Column, fn) -> Column:
    """Evaluate ``c`` once per row and pass it to ``fn`` as a bound lambda
    variable: ``element_at(transform(array(c), fn), 1)``.

    Higher-order functions run interpreted (no whole-stage codegen, no
    common-subexpression elimination), so a subexpression referenced
    inside a lambda body re-evaluates per array element. Binding it as
    the lambda argument makes it a NamedLambdaVariable — computed once,
    however many times the body references it (shingling at sf0.1:
    3.6s -> 0.7s).
    """
    return F.element_at(F.transform(F.array(c), fn), 1)


def ws_token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column, pattern: str = BPE_ISH_PATTERN) -> Column:
    """Count of BPE-style pre-tokens (regex alternation, JVM-side)."""
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def punct_ratio(c: Column) -> Column:
    """Fraction of non-space characters that are punctuation/symbols."""
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(nonspace == 0, F.lit(0.0)).otherwise(punct / nonspace)


def member_count(toks: Column, vocab: Sequence[str]) -> Column:
    """Occurrences of any vocab word in the token array (not distinct)."""
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(c: Column, stopwords: Sequence[str] = EN_STOPWORDS) -> Column:
    toks = tokens(c)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(member_count(toks, stopwords) / n)


def mean_token_len(c: Column) -> Column:
    toks = tokens(c)
    n = F.size(toks)
    total = F.length(F.regexp_replace(c, r"\s", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n)


def distinct_token_ratio(c: Column) -> Column:
    toks = tokens(c)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(F.size(F.array_distinct(toks)) / n)


def lang_guess(c: Column, markers: Mapping[str, Sequence[str]] | None = None) -> Column:
    """Language-ID heuristic: most marker-word hits wins; ties resolve in
    the (fixed) iteration order of ``markers``; zero hits -> 'und'."""
    markers = markers or LANG_MARKERS
    toks = tokens(c)
    hits = {lang: member_count(toks, words) for lang, words in markers.items()}
    langs = list(markers)
    best = None
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other == lang:
                continue
            # strictly-greater for languages later in the priority order,
            # greater-or-equal never needed: earlier langs win ties because
            # we chain when() in priority order.
            cond = cond & (hits[lang] >= hits[other])
        best = best.when(cond, F.lit(lang)) if best is not None else F.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def quality_score(c: Column, scale: int | None = 4) -> Column:
    """Composite quality in [0,1]: length, lexical diversity, stopword mass.

    The exact weights are a policy choice; what matters for the engine is
    that the whole composite stays one codegen stage. ``scale=None`` skips
    rounding (raw IEEE doubles are cross-engine reproducible; rounded ones
    can differ when the true value ties at the rounding digit).
    """
    length_part = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    diversity = distinct_token_ratio(c)
    stop = stopword_ratio(c)
    raw = 0.4 * length_part + 0.3 * diversity + 0.3 * stop
    return F.round(raw, scale) if scale is not None else raw


# PII patterns kept to syntax shared by Java regex and RE2 (no lookarounds)
# so the Spark expression and a DuckDB oracle scrub identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_email_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(PII_EMAIL)).cast("bigint")


def pii_phone_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(PII_PHONE)).cast("bigint")


def scrub_pii(c: Column) -> Column:
    """Redact emails then phone numbers (order matters and is part of the
    contract: the email pattern can consume digit-dash runs in a local
    part, so emails go first). Pure regexp_replace — codegen, no UDF."""
    cleaned = F.regexp_replace(c, PII_EMAIL, "[EMAIL]")
    return F.regexp_replace(cleaned, PII_PHONE, "[PHONE]")


def ngram_repetition(c: Column, k: int = 3) -> Column:
    """STRUCT(n_grams, n_distinct_grams) over the k-token shingle stream —
    the inputs to Gopher-style duplicate-n-gram-fraction quality gates.
    The shingle array is bound once (see ``bind``); counts stay integers
    so downstream ratios are engine-exact divisions."""

    def _from_sh(sh: Column) -> Column:
        return F.struct(
            F.size(sh).cast("bigint").alias("n_grams"),
            F.size(F.array_distinct(sh)).cast("bigint").alias("n_distinct_grams"),
        )

    return bind(shingles(c, k), _from_sh)


def exact_hash(c: Column) -> Column:
    """Exact-dedup key: md5 of whitespace-normalized text."""
    return F.md5(F.array_join(tokens(c), " "))


def shingles(c: Column, k: int = 3) -> Column:
    """ARRAY of k-token shingles ('a b c' strings) in document order.

    The token array is bound once via ``bind`` — the slice-per-index
    transform would otherwise re-tokenize the document for every shingle.
    """

    def _from_toks(toks: Column) -> Column:
        n = F.size(toks) - (k - 1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))

    return bind(tokens(c), _from_toks)


def fingerprint(c: Column, k: int = 3) -> Column:
    """Winnowing-style doc fingerprint: lexicographic min of md5(shingle).

    Rolling-hash flavored (each shingle is a window of the token stream);
    two documents sharing any minimal shingle collide — cheap candidate
    key for near-dup mining, stable under content reordering.
    """
    return F.array_min(F.transform(shingles(c, k), F.md5))


def compression_ratios(df: "DataFrame", id_col: str, text_col: str) -> "DataFrame":
    """(id, n_bytes, n_compressed, ratio_permille) per row: zlib level-6
    compressed size over raw UTF-8 size — the long-range repetitiveness
    signal. Arrow-batched mapInPandas (zlib is C code; one worker per
    core chews its batch); all outputs integers, ratio is integer
    permille. No SQL oracle exists (DuckDB has no zlib) — unit tests pin
    exact recompute."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    src = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    schema = StructType(
        [
            StructField(id_col, src.schema["_id"].dataType),
            StructField("n_bytes", LongType()),
            StructField("n_compressed", LongType()),
            StructField("ratio_permille", LongType()),
        ]
    )

    def _compress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [(t or "").encode("utf-8") for t in pdf["_text"]]
            n_raw = [len(b) for b in raw]
            n_comp = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf["_id"],
                    "n_bytes": n_raw,
                    "n_compressed": n_comp,
                    "ratio_permille": [
                        c * 1000 // max(r, 1) for c, r in zip(n_comp, n_raw)
                    ],
                }
            )

    return src.mapInPandas(_compress, schema)
