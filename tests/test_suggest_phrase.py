"""Phrase suggester (ES did-you-mean, unigram form): per-token
distance-<=1 candidates, Laplace-smoothed unigram LM + error likelihood,
confidence threshold, optional collate prune via one count_many pass.
Verified against a brute-force recomputation of the same definitions.
"""

import itertools
import math

import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

# vocabulary: alpha(5 docs) beta(3) gamma(2) delta(1) plus misc
DOCS = [
    ("d0", "alpha beta gamma"),
    ("d1", "alpha beta"),
    ("d2", "alpha gamma"),
    ("d3", "alpha beta kappa"),
    ("d4", "alpha delta"),
    ("d5", "omega kappa"),
]
ERR = 0.05


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spidx"))
    df = spark.createDataFrame(
        [("r", p, "c", "en", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    build_segment(spark, df, root, IndexConfig(n_buckets=2, block_size=8))
    e = SearchEngine(spark, root)
    e.warm()
    return e


def _brute(eng, toks, max_per_token=5, confidence=1.0):
    vocab = {}
    for p, t in DOCS:
        for w in set(t.split()):
            vocab[w] = vocab.get(w, 0) + 1
    denom = float(len(DOCS) + len(vocab))

    def lev1(a, b):
        # distance <= 1 check via the engine's own helper semantics
        from gofias_spark.query.engine import _lev_le1
        return _lev_le1(a, b)

    def cands(t):
        neigh = sorted(
            ((w, c) for w, c in vocab.items() if lev1(t, w)),
            key=lambda p: (-p[1], p[0]),
        )
        top = [w for w, _ in neigh[:max_per_token]]
        if t not in top:
            top.append(t)
        return top

    def score(seq):
        s = 0.0
        for c, o in zip(seq, toks):
            s += math.log((vocab.get(c, 0) + 1) / denom)
            keep_real = c == o and vocab.get(o, 0) > 0
            s += math.log(1 - ERR if keep_real else ERR)
        return s

    base = score(toks)
    rows = [
        (" ".join(combo), round(score(combo), 6))
        for combo in itertools.product(*[cands(t) for t in toks])
        if list(combo) != toks and score(combo) > base + math.log(confidence)
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows


def test_matches_bruteforce(eng):
    for q in ("alpa beta", "alph gamm", "lpha", "alpha beta"):
        toks = q.split()
        got = eng.suggest_phrase(q, k=10)
        expect = _brute(eng, toks)[:10]
        assert list(zip(got["suggestion"], got["score"])) == expect, q


def test_best_suggestion_is_the_obvious_fix(eng):
    out = eng.suggest_phrase("alpa betb")
    assert out["suggestion"].iloc[0] == "alpha beta"


def test_identity_never_suggested_and_confidence(eng):
    out = eng.suggest_phrase("alpha beta")  # correctly spelled input
    assert "alpha beta" not in set(out["suggestion"])
    # every returned suggestion must beat the input's own score
    # (confidence=1.0): for a well-spelled frequent phrase, substituting
    # any token costs the error likelihood, so nothing can beat it
    assert len(out) == 0


def test_collate_prunes_nonmatching(eng):
    # 'omega delta' never co-occurs: collate must drop sequences with
    # zero conjunctive matches while keeping real ones
    out = eng.suggest_phrase("omga delt", k=10, collate=True)
    if len(out):
        for _, r in out.iterrows():
            assert r["matches"] > 0
            assert eng.count(r["suggestion"]) == r["matches"]


def test_validation(eng):
    with pytest.raises(ValueError):
        eng.suggest_phrase("")
    with pytest.raises(ValueError):
        eng.suggest_phrase("a b c d e f")
    with pytest.raises(ValueError):
        eng.suggest_phrase("alpha", err=0.0)
