"""Phrase search (slow-phrase: conjunctive index candidates verified
against stored content) and fuzzy term expansion (SymSpell
deletion-neighborhood candidates + exact levenshtein verify).

Both are extensions beyond the reference's operator=and matches
(elasticAddressRepository.go:483) — ES match_phrase / fuzziness analogues.
"""

import itertools

import pytest

from gofias_spark.config import AnalyzerConfig, IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine, _lev_le1

DOCS = [
    ("d0", "alpha beta gamma"),   # phrase at string start
    ("d1", "x alpha beta"),       # phrase at string end
    ("d2", "alpha, beta!"),       # punctuation separators are still adjacent
    ("d3", "alpha x beta"),       # intervening token: NOT adjacent
    ("d4", "beta alpha"),         # wrong order
    ("d5", "ALPHA Beta"),         # case-insensitive
    ("d6", "alphax beta"),        # token boundary: 'alphax' is not 'alpha'
    ("d7", "alpha\nbeta"),        # newline is a non-word separator
    ("d8", "alpha alpha beta"),   # duplicate token preceding the phrase
    ("d9", "gamma delta"),
]
PHRASE_HITS = ["d0", "d1", "d2", "d5", "d7", "d8"]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("phraseidx"))
    df = spark.createDataFrame(
        [("r", p, "c", "en", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    build_segment(spark, df, root, IndexConfig(n_buckets=2, block_size=8))
    e = SearchEngine(spark, root)
    e.warm()
    return e


def _paths(df):
    return sorted(r["path"] for r in df.collect())


# -- phrase -----------------------------------------------------------------


def test_phrase_adjacency(eng):
    assert _paths(eng.search_phrase("alpha beta")) == PHRASE_HITS


def test_phrase_three_terms(eng):
    assert _paths(eng.search_phrase("alpha beta gamma")) == ["d0"]


def test_phrase_single_term_equals_term_match(eng):
    ph = eng.search_phrase("beta", k=20).collect()
    t = eng.search("beta", k=20).collect()
    assert [(r["path"], round(r["score"], 9)) for r in ph] == [
        (r["path"], round(r["score"], 9)) for r in t
    ]


def test_phrase_scores_are_conjunctive_bm25(eng):
    """Verification only filters — survivors keep the AND-match score."""
    and_scores = {
        r["path"]: r["score"]
        for r in eng.search("alpha beta", k=20).collect()
    }
    for r in eng.search_phrase("alpha beta", k=20).collect():
        assert r["score"] == pytest.approx(and_scores[r["path"]], rel=1e-12)


def test_phrase_no_match_empty_schema(eng):
    out = eng.search_phrase("gamma alpha")
    assert out.count() == 0
    assert {"doc_id", "score", "path"} <= set(out.columns)


def test_phrase_missing_term_short_circuits(eng):
    assert eng.search_phrase("alpha zzzz").count() == 0


def test_phrase_with_filters(eng):
    # doclen <= 2 keeps only the two-token docs among the hits
    out = eng.search_phrase(
        "alpha beta", filters={"doclen": {"lte": 2}}
    )
    assert _paths(out) == ["d2", "d5", "d7"]


def test_phrase_paging(eng):
    full = eng.search_phrase("alpha beta", k=10).collect()
    page = eng.search_phrase("alpha beta", k=2, offset=2).collect()
    assert [r["path"] for r in page] == [r["path"] for r in full[2:4]]


def test_phrase_requires_standard_analyzer(eng, monkeypatch):
    monkeypatch.setattr(
        eng, "analyzer", AnalyzerConfig(mode="edge_ngram", min_gram=1,
                                        max_gram=10)
    )
    with pytest.raises(ValueError, match="standard-analyzer"):
        eng.search_phrase("alpha beta")


# -- fuzzy ------------------------------------------------------------------


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_lev_le1_exhaustive():
    words = [
        "".join(w)
        for n in range(4)
        for w in itertools.product("abc", repeat=n)
    ]
    for a in words:
        for b in words:
            assert _lev_le1(a, b) == (_lev_ref(a, b) <= 1), (a, b)


def test_fuzzy_terms_driver_and_spark_paths_agree(eng):
    for q in ("alpha", "beta", "gamm", "zz", "x"):
        driver = eng.fuzzy_terms(q)
        saved = eng._stats_cache
        try:
            eng._stats_cache = None  # force the deletion-key equi-join path
            dist = eng.fuzzy_terms(q)
        finally:
            eng._stats_cache = saved
        assert driver == dist, q
    assert eng.fuzzy_terms("alpha") == ["alpha", "alphax"]


def test_fuzzy_terms_ranked_by_df_and_capped(eng):
    full = eng.fuzzy_terms("alpha")
    dfs = eng._term_dfs(full)
    assert dfs[full[0]] >= dfs[full[-1]]
    assert eng.fuzzy_terms("alpha", max_expansions=1) == full[:1]


def test_fuzzy_no_neighborhood(eng):
    assert eng.fuzzy_terms("qqqqq") == []
    assert eng.search_fuzzy("qqqqq").count() == 0


def test_search_fuzzy_is_disjunctive_expansion(eng):
    fz = eng.search_fuzzy("alpha", k=20).collect()
    ored = eng.search("alpha alphax", k=20, mode="or").collect()
    assert [(r["path"], r["score"]) for r in fz] == [
        (r["path"], r["score"]) for r in ored
    ]


def test_search_fuzzy_multi_token_raises(eng):
    with pytest.raises(ValueError, match="single token"):
        eng.search_fuzzy("alpha beta")


# -- wildcard -----------------------------------------------------------------


def test_wildcard_terms_both_paths_agree(eng):
    # vocab: alpha alphax beta gamma delta x
    for pat in ("*a", "a*", "?lpha*", "g?mma", "*", "z*", "x"):
        driver = eng.wildcard_terms(pat)
        saved = eng._stats_cache
        try:
            eng._stats_cache = None  # force the Spark rlike path
            dist = eng.wildcard_terms(pat)
        finally:
            eng._stats_cache = saved
        assert driver == dist, pat
    assert eng.wildcard_terms("alpha*") == ["alpha", "alphax"]
    assert eng.wildcard_terms("?eta") == ["beta"]
    assert eng.wildcard_terms("*et*") == ["beta"]
    assert set(eng.wildcard_terms("*")) == {
        "alpha", "alphax", "beta", "gamma", "delta", "x"
    }


def test_literal_prefix_extraction():
    """Conservative literal-prefix cut for the warm expansion scan (r4
    verdict #5): wildcard dialect stops at */?; regexp dialect stops at
    any metachar and un-claims the char a quantifier applies to."""
    lp = SearchEngine._literal_prefix
    assert lp("alpha*", "wildcard") == "alpha"
    assert lp("a?x*", "wildcard") == "a"
    assert lp("*tail", "wildcard") == ""
    assert lp("plain", "wildcard") == "plain"
    assert lp("abc.*", "regexp") == "abc"
    assert lp("ab*", "regexp") == "a"      # b is quantified away
    assert lp("ab+c", "regexp") == "a"
    assert lp("ab{2}", "regexp") == "a"
    # any alternation kills the prefix: `gamma|delta` matches delta too
    assert lp("gamma|delta", "regexp") == ""
    assert lp("a(b|c)", "regexp") == ""
    assert lp("[ab]x", "regexp") == ""
    assert lp("a\\d+", "regexp") == "a"
    assert lp("literal", "regexp") == "literal"


def test_prefix_cut_matches_full_scan(eng):
    """The bisected sorted-vocab range scan must return exactly the
    full-dict scan's expansions for every pattern shape (and the cut is
    actually taken: the sorted vocab gets built)."""
    import re

    assert eng._stats_cache is not None
    for pat in ("alpha*", "a*", "g?mma", "x", "alphax", "zz*", "*a"):
        rx = re.compile(SearchEngine._wildcard_regex(pat))
        full = sorted(
            t for t in eng._stats_cache if rx.match(t)
        )
        assert sorted(eng.wildcard_terms(pat, max_expansions=None)) \
            == full, pat
    assert eng._sorted_vocab is not None  # the cut path was exercised
    for pat in ("al.*", "gamma|delta", "be(ta)?", ".*x"):
        rx = re.compile(f"^(?:{pat})$")
        full = sorted(t for t in eng._stats_cache if rx.match(t))
        assert sorted(eng.regexp_terms(pat, max_expansions=None)) \
            == full, pat
    # complete_prefix equals the startswith scan, hottest-first
    got = eng.complete_prefix("al", k=10)
    want = sorted(
        ((t, n) for t, n in eng._stats_cache.items()
         if t.startswith("al")),
        key=lambda x: (-x[1], x[0]),
    )
    assert list(got["term"]) == [t for t, _ in want]
    # sorted vocab is invalidated with the caches it indexes
    eng._drop_resident_caches()
    assert eng._sorted_vocab is None
    eng.warm()


def test_wildcard_literal_is_exact_lookup(eng):
    assert eng.wildcard_terms("beta") == ["beta"]
    assert eng.wildcard_terms("bet") == []  # no partial match w/o wildcard


def test_wildcard_regex_metachars_are_literal(eng):
    # '.' must not act as a regex any-char
    assert eng.wildcard_terms("bet.") == []
    assert eng.wildcard_terms("b.ta") == []


def test_search_wildcard_is_disjunctive_expansion(eng):
    wc = eng.search_wildcard("alph*", k=20).collect()
    ored = eng.search("alpha alphax", k=20, mode="or").collect()
    assert [(r["path"], r["score"]) for r in wc] == [
        (r["path"], r["score"]) for r in ored
    ]
    assert eng.search_wildcard("zz*").count() == 0


def test_search_wildcard_max_expansions(eng):
    top1 = eng.wildcard_terms("alph*", max_expansions=1)
    assert len(top1) == 1
    wc = eng.search_wildcard("alph*", k=20, max_expansions=1).collect()
    direct = eng.search(top1[0], k=20, mode="or").collect()
    assert [r["path"] for r in wc] == [r["path"] for r in direct]
