"""Property-based differential fuzz of the positional kernel: random
phrase / unordered-span queries over a collision-heavy random corpus,
checked against the brute-force oracles from test_positions. All tiers
share the one-positions-scan kernel (engine.py phrase family), so the
warm local tier is the efficient fuzz surface; cross-tier equivalence is
pinned separately by test_positions' parametrized suites."""

import re

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine
from tests.test_positions import _sloppy_oracle, _unordered_oracle

ALPHABET = ["ka", "kb", "kc", "kd", "ke", "kf"]


def _random_docs(n=60, seed=20260821):
    """Collision-heavy corpus: few distinct terms, many repeats, so
    random phrases hit real positional structure (adjacency, self-
    repetition, wrap-around candidates)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ln = int(rng.integers(1, 26))
        toks = [ALPHABET[j] for j in rng.integers(0, len(ALPHABET), ln)]
        rows.append((f"d{i}", " ".join(toks)))
    return rows


DOCS = _random_docs()


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("posfuzzidx"))
    df = spark.createDataFrame(
        [("r", p, "c", "en", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    build_segment(spark, df, root,
                  IndexConfig(n_buckets=2, block_size=8, positions=True))
    e = SearchEngine(spark, root)
    e.warm()
    assert e._local_positions is not None  # the warm local tier
    yield e
    e.close()


FUZZ = dict(deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(terms=st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=3),
       slop=st.integers(0, 4))
@settings(max_examples=120, **FUZZ)
def test_phrase_slop_matches_bruteforce(eng, terms, slop):
    q = " ".join(terms)
    got = {r["path"] for r in eng.search_phrase(q, k=100, slop=slop)
           .collect()}
    assert got == _sloppy_oracle(DOCS, q, slop), (q, slop)


@given(terms=st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=3),
       slop=st.integers(0, 4))
@settings(max_examples=120, **FUZZ)
def test_span_near_unordered_matches_bruteforce(eng, terms, slop):
    q = " ".join(terms)
    got = {r["path"] for r in eng.search_span_near(q, slop=slop, k=100)
           .collect()}
    assert got == _unordered_oracle(DOCS, q, slop), (q, slop)


@given(terms=st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=2),
       first_end=st.integers(1, 12))
@settings(max_examples=80, **FUZZ)
def test_span_first_matches_bruteforce(eng, terms, first_end):
    """span_first: some exact-phrase window must END at position
    <= first_end (1-based end == last index + 1)."""
    q = " ".join(terms)
    got = {r["path"]
           for r in eng.search_span_first(q, first_end, k=100).collect()}
    want = set()
    n = len(terms)
    for path, text in DOCS:
        toks = re.findall(r"\w+", text.lower())
        for s in range(len(toks) - n + 1):
            if toks[s:s + n] == terms and s + n <= first_end:
                want.add(path)
                break
    assert got == want, (q, first_end)


# -- BM25 rank identity vs a from-scratch naive scorer ---------------------


def _naive_bm25(docs, qterms, mode, k1=1.2, b=0.75):
    """Independent BM25 reference computed from raw text (no engine
    code): returns [(path, score)] for matching docs, score desc then
    doc order stable — the WAND/block-max pruning must reproduce these
    scores exactly."""
    toks = {p: re.findall(r"\w+", t.lower()) for p, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in qterms}
    out = []
    for p, tv in toks.items():
        present = [t for t in qterms if t in tv]
        if mode == "and" and len(present) != len(qterms):
            continue
        if not present:
            continue
        score = 0.0
        for t in present:
            tf = tv.count(t)
            idf = np.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(tv) / avgdl)
            )
        out.append((p, score))
    return out


@given(terms=st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=3,
                      unique=True),
       mode=st.sampled_from(["and", "or"]))
@settings(max_examples=120, **FUZZ)
def test_bm25_rank_identity_vs_naive(eng, terms, mode):
    q = " ".join(terms)
    got = {r["path"]: r["score"]
           for r in eng.search(q, k=100, mode=mode).collect()}
    want = dict(_naive_bm25(DOCS, terms, mode))
    assert set(got) == set(want), (q, mode)
    for p, s in want.items():
        assert got[p] == pytest.approx(s, rel=1e-9), (q, mode, p)
