"""Analyzer parity tests (FIXTURES.md §6) — standard / edge_ngram / ngram
modes vs hand-expected tokens mirroring the ES analyzer configs
(standard+lowercase elasticAddressRepository.go:56-59; edge_ngram 1..40
:45-49; houses ngram 1..15 / edge_ngram 1..50 elasticHouseRepository.go:43-52).
"""

import pandas as pd

from gofias_spark.analyzer import (
    analyze_query,
    term_frequencies,
    tokenize_series,
    tokenize_text,
)
from gofias_spark.config import AnalyzerConfig

STD = AnalyzerConfig()


def test_standard_mixed_case():
    assert tokenize_text("FooBar baz", STD) == ["foobar", "baz"]


def test_standard_unicode():
    assert tokenize_text("Москва, ул. Ленина", STD) == ["москва", "ул", "ленина"]


def test_standard_code_punctuation():
    assert tokenize_text("func (a *Repo) Get(id string) error", STD) == [
        "func", "a", "repo", "get", "id", "string", "error",
    ]


def test_standard_edges():
    assert tokenize_text("", STD) == []
    assert tokenize_text("x", STD) == ["x"]
    assert tokenize_text("under_score stays", STD) == ["under_score", "stays"]


def test_edge_ngram():
    cfg = AnalyzerConfig(mode="edge_ngram", min_gram=1, max_gram=40)
    assert tokenize_text("abc", cfg) == ["a", "ab", "abc"]
    # gram cap: 44-char identifier truncates at max_gram prefixes
    long = "a" * 44
    toks = tokenize_text(long, cfg)
    assert len(toks) == 40 and toks[-1] == "a" * 40


def test_edge_ngram_min2():
    cfg = AnalyzerConfig(mode="edge_ngram", min_gram=2, max_gram=3)
    assert tokenize_text("abcd x", cfg) == ["ab", "abc"]


def test_ngram():
    cfg = AnalyzerConfig(mode="ngram", min_gram=1, max_gram=15)
    assert tokenize_text("abc", cfg) == ["a", "b", "c", "ab", "bc", "abc"]


def test_series_matches_scalar():
    texts = ["FooBar baz", "", "Москва, ул. Ленина", "a_b c1 42"]
    for cfg in (
        STD,
        AnalyzerConfig(mode="edge_ngram", min_gram=1, max_gram=5),
        AnalyzerConfig(mode="ngram", min_gram=2, max_gram=4),
    ):
        got = tokenize_series(pd.Series(texts), cfg).tolist()
        assert got == [tokenize_text(t, cfg) for t in texts]


def test_term_frequencies():
    out = term_frequencies(
        pd.Series([7, 8, 9]),
        pd.Series(["a b a", "b", ""]),
        STD,
    )
    rows = {(r.doc_id, r.term): (r.tf, r.dl) for r in out.itertuples()}
    assert rows == {(7, "a"): (2, 3), (7, "b"): (1, 3), (8, "b"): (1, 1)}


def test_analyze_query_dedupes_preserving_order():
    assert analyze_query("Bulk index BULK") == ["bulk", "index"]
    assert analyze_query("...") == []
