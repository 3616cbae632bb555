"""match_phrase_prefix (ES analogue): fixed tokens adjacent, final slot
completed by ANY vocabulary term starting with the prefix. Extension
beyond the reference's operator=and matches; scoring contract = BM25 over
the fixed terms only (the prefix slot filters — one token more of the
phrase "proximity only filters" contract).

Tier parity is the core gate here: the warmed engine answers from the
resident positional sidecar, an unwarmed engine over the same index runs
the distributed positional kernel, and a positions=False index takes the
JVM-regex content-verify plan — all three must return identical
(path, score) pages.
"""

import re

import numpy as np

import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

DOCS = [
    ("d0", "alpha gamma x"),        # completion 'gamma' follows alpha
    ("d1", "alpha gap beta"),       # completion 'gap'
    ("d2", "alpha beta gamma"),     # beta intervenes: NOT a hit for alpha ga
    ("d3", "gamma alpha"),          # wrong order
    ("d4", "alpha gab"),            # completion 'gab' at string end
    ("d5", "alpha galaxy beta"),    # completion 'galaxy'
    ("d6", "ALPHA, Gamma!"),        # case-insensitive, punctuation adjacency
    ("d7", "alpha"),                # nothing follows
    ("d8", "xalpha gamma"),         # 'xalpha' is not the token 'alpha'
    ("d9", "beta gamma"),           # fixed term absent
    ("d10", "beta gamma alpha ok"), # 3-token chain target
]
RX = re.compile(r"(^|[^a-z0-9_])alpha[^a-z0-9_]+ga[a-z0-9_]*")
EXPECTED = sorted(
    p for p, t in DOCS if RX.search(t.lower())
)  # d0 d1 d4 d5 d6


def _build(spark, root, positions=True):
    df = spark.createDataFrame(
        [("r", p, "c", "en", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    build_segment(
        spark, df, root,
        IndexConfig(n_buckets=2, block_size=8, positions=positions),
    )


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ppidx"))
    _build(spark, root)
    e = SearchEngine(spark, root)
    e.warm()
    return e


@pytest.fixture(scope="module")
def eng_cold(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ppidx_cold"))
    _build(spark, root)
    return SearchEngine(spark, root)  # distributed positional kernel


@pytest.fixture(scope="module")
def eng_nopos(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ppidx_nopos"))
    _build(spark, root, positions=False)
    return SearchEngine(spark, root)  # rlike content-verify plan


def _page(e, q, **kw):
    return sorted(
        (r["path"], round(r["score"], 9))
        for r in e.search_phrase_prefix(q, k=20, **kw).collect()
    )


def test_hit_set_matches_regex_oracle(eng):
    assert [p for p, _ in _page(eng, "alpha ga")] == EXPECTED


def test_scores_are_fixed_term_bm25(eng):
    """The prefix slot only filters: survivors keep the score of the
    fixed-terms AND match."""
    base = {
        r["path"]: r["score"] for r in eng.search("alpha", k=20).collect()
    }
    hits = eng.search_phrase_prefix("alpha ga", k=20).collect()
    assert hits
    for r in hits:
        assert r["score"] == pytest.approx(base[r["path"]], rel=1e-12)


def test_tier_parity(eng, eng_cold, eng_nopos):
    for q in ("alpha ga", "beta gamma a", "alpha zz", "gamma al"):
        warm = _page(eng, q)
        assert _page(eng_cold, q) == warm, q
        assert _page(eng_nopos, q) == warm, q


def test_three_token_chain(eng):
    assert [p for p, _ in _page(eng, "beta gamma a")] == ["d10"]


def test_max_expansions_alphabetical_cap(eng, eng_nopos):
    # vocabulary completions of 'ga': gab < galaxy < gamma < gap
    # cap=1 keeps only 'gab' -> d4 alone, on BOTH verify strategies
    assert [p for p, _ in _page(eng, "alpha ga", max_expansions=1)] == ["d4"]
    assert [
        p for p, _ in _page(eng_nopos, "alpha ga", max_expansions=1)
    ] == ["d4"]
    # cap=4 covers every completion == uncapped
    assert _page(eng, "alpha ga", max_expansions=4) == _page(eng, "alpha ga")


def test_single_token_delegates_to_wildcard(eng):
    pp = eng.search_phrase_prefix("ga", k=20).collect()
    wc = eng.search_wildcard("ga*", k=20).collect()
    assert [(r["path"], round(r["score"], 9)) for r in pp] == [
        (r["path"], round(r["score"], 9)) for r in wc
    ]


def test_empty_cases(eng):
    assert eng.search_phrase_prefix("zzz ga").count() == 0  # fixed df=0
    assert eng.search_phrase_prefix("alpha qq").count() == 0  # no completion
    assert eng.search_phrase_prefix("").count() == 0


def test_filters_apply(eng, eng_cold, eng_nopos):
    # warm = local masks; cold positional = two-stage scored+verify join;
    # nopos = filtered slow-phrase rlike — all three must agree
    # (doclen <= 2 keeps d4 "alpha gab" and d6 "ALPHA, Gamma!")
    for e in (eng, eng_cold, eng_nopos):
        out = e.search_phrase_prefix(
            "alpha ga", k=20, filters={"doclen": {"lte": 2}}
        )
        assert sorted(r["path"] for r in out.collect()) == ["d4", "d6"]


# ---- match_bool_prefix (bool form: no adjacency) -------------------------


def test_bool_prefix_or_equals_expanded_or(eng):
    """OR mode == plain OR search over fixed tokens + all completions."""
    exp = eng.wildcard_terms("ga*", None)
    assert set(exp) >= {"gamma", "gap", "gab", "galaxy"}
    got = eng.search_bool_prefix("alpha ga", k=20, mode="or",
                                 as_pandas=True)
    want = eng.search(" ".join(["alpha"] + exp), k=20, mode="or",
                      as_pandas=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(got["score"], want["score"], rtol=1e-9)


def test_bool_prefix_and_requires_fixed_and_any_completion(eng):
    got = eng.search_bool_prefix("alpha ga", k=100, mode="and",
                                 as_pandas=True)
    paths = sorted(got["path"])
    # alpha present AND any ga* token present, order/adjacency irrelevant:
    # d2 (alpha beta gamma) and d3 (gamma alpha) now match; d10 too
    assert paths == ["d0", "d1", "d10", "d2", "d3", "d4", "d5", "d6"]


def test_bool_prefix_ignores_order_unlike_phrase_prefix(eng):
    bp = set(
        eng.search_bool_prefix("alpha ga", k=100, mode="and",
                               as_pandas=True)["path"]
    )
    pp = set(
        r["path"] for r in eng.search_phrase_prefix("alpha ga",
                                                    k=100).collect()
    )
    assert pp < bp  # strictly more docs without the adjacency gate
    assert {"d2", "d3"} <= bp - pp


def test_bool_prefix_edges(eng):
    assert len(eng.search_bool_prefix("", k=5, as_pandas=True)) == 0
    assert len(eng.search_bool_prefix("alpha zzzqx", k=5, mode="and",
                                      as_pandas=True)) == 0
    # single token degenerates to the pure prefix (wildcard) query
    single = eng.search_bool_prefix("ga", k=100, as_pandas=True)
    want = eng.search_wildcard("ga*", k=100, as_pandas=True)
    assert list(single["doc_id"]) == list(want["doc_id"])
    with pytest.raises(ValueError, match="mode"):
        eng.search_bool_prefix("a b", mode="phrase")
