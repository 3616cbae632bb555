"""bool.should minimum_should_match + query-time clause boosts: all three
query tiers (driver-local searcher, term-pruned serve cache, distributed
cogroup) must be rank- and score-identical to the pure-Python oracle, and
the degenerate msm values must route to the pruned kernels (msm<=1 == plain
OR, msm==n == AND) rather than the unpruned counting kernel.

ES semantics references: Lucene MinShouldMatchSumScorer (minimum_should_match
on a bool.should), BoostQuery (clause boost multiplies the term weight).
The reference composes bool queries via olivere/elastic
(/root/reference/app/infrastructure/persistence/grpc/handler/addressHandler.go);
msm/boost complete that bool surface.
"""

import numpy as np
import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query import kernel as K
from gofias_spark.query.engine import SearchEngine

from .oracle import OracleIndex

CFG = IndexConfig(n_buckets=5, block_size=16)


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msmidx"))
    build_segment(spark, synth_corpus(spark, 400), root, CFG)
    return root


@pytest.fixture(scope="module")
def engines(spark, root):
    served = SearchEngine(spark, root)
    served.warm(local_max_blocks=0)
    assert served._serve is not None and served._local_blocks is None
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    assert dist._serve is None
    local = SearchEngine(spark, root, cache=False)
    local.warm()
    assert local._local_blocks is not None
    return {"serve": served, "dist": dist, "local": local}


@pytest.fixture(scope="module")
def oracle(spark, root):
    eng = SearchEngine(spark, root)
    meta = eng.doc_meta.select("doc_id", "content").collect()
    return OracleIndex({r["doc_id"]: r["content"] for r in meta})


QUERY = "merge_6 update_7 shard_8"  # dfs 149/144/135 of 400; docs
# matching >=1/>=2/3 terms: 275/120/33 — msm=2 is a strict middle


def _ids_scores(res):
    if hasattr(res, "toPandas"):  # Spark DataFrame -> pandas
        res = res.toPandas()
    return list(res["doc_id"]), list(res["score"])


def _assert_matches_oracle(res, expected, label):
    got_ids, got_scores = _ids_scores(res)
    exp_ids = [d for d, _ in expected]
    exp_scores = [s for _, s in expected]
    assert got_ids == exp_ids, f"{label}: {got_ids} != {exp_ids}"
    assert np.allclose(got_scores, exp_scores, rtol=1e-9, atol=0), label


@pytest.mark.parametrize("tier", ["serve", "dist", "local"])
@pytest.mark.parametrize("m", [1, 2, 3, 4])
def test_msm_rank_identity(engines, oracle, tier, m):
    exp = oracle.search(QUERY, k=12, mode="or", msm=m)
    res = engines[tier].search(
        QUERY, k=12, mode="or", minimum_should_match=m, with_meta=False
    )
    _assert_matches_oracle(res, exp, f"{tier} msm={m}")


def test_msm_differs_from_or_and_and(oracle):
    """The fixture corpus must actually exercise the strict middle: msm=2
    differs from both msm=1 (OR) and msm=3 (AND) — otherwise the parametrized
    identity test proves nothing."""
    r1 = oracle.search(QUERY, k=400, mode="or", msm=1)
    r2 = oracle.search(QUERY, k=400, mode="or", msm=2)
    r3 = oracle.search(QUERY, k=400, mode="or", msm=3)
    assert len(r1) > len(r2) > len(r3) > 0


@pytest.mark.parametrize("tier", ["serve", "dist", "local"])
def test_boost_rank_identity(engines, oracle, tier):
    boosts = {"shard_8": 3.0, "update_7": 0.25}
    exp = oracle.search(QUERY, k=12, mode="or", boosts=boosts)
    res = engines[tier].search(
        QUERY, k=12, mode="or", boosts=boosts, with_meta=False
    )
    _assert_matches_oracle(res, exp, f"{tier} boosted")


def test_boost_changes_ranking(oracle, engines):
    plain_ids, _ = _ids_scores(
        engines["local"].search(QUERY, k=12, mode="or", with_meta=False)
    )
    boosted_ids, _ = _ids_scores(
        engines["local"].search(
            QUERY, k=12, mode="or", boosts={"shard_8": 8.0}, with_meta=False
        )
    )
    assert plain_ids != boosted_ids


def test_boost_and_mode(engines, oracle):
    boosts = {"merge_6": 2.0}
    exp = oracle.search("merge_6 update_7", k=10, mode="and", boosts=boosts)
    res = engines["local"].search(
        "merge_6 update_7", k=10, mode="and", boosts=boosts, with_meta=False
    )
    _assert_matches_oracle(res, exp, "and-mode boosted")


def test_msm_with_filters_and_must_not(engines, oracle):
    """msm composes with the bool filter context and must_not exclusion on
    the distributed path (allowed/excluded masks reach score_msm)."""
    eng = engines["dist"]
    exp = [
        (d, s)
        for d, s in oracle.search(QUERY, k=4000, mode="or", msm=2)
        if "query_10" not in oracle.tf[d]
    ][:10]
    res = eng.search(
        QUERY, k=10, mode="or", minimum_should_match=2,
        must_not="query_10", with_meta=False,
    )
    _assert_matches_oracle(res, exp, "msm + must_not")


def test_msm_validation(engines):
    eng = engines["local"]
    with pytest.raises(ValueError, match="mode='or'"):
        eng.search(QUERY, mode="and", minimum_should_match=2)
    with pytest.raises(ValueError, match=">= 1"):
        eng.search(QUERY, mode="or", minimum_should_match=0)
    with pytest.raises(ValueError, match="must be > 0"):
        eng.search(QUERY, mode="or", boosts={"merge_6": 0.0})


def test_msm_above_present_terms_empty(engines):
    r = engines["local"].search(
        QUERY, k=10, mode="or", minimum_should_match=4, with_meta=False,
        as_pandas=True,
    )
    assert len(r) == 0


def test_degenerate_msm_routes_to_pruned_kernels():
    assert K.select_kernel("or", None, 3) is K.score_or
    assert K.select_kernel("or", 1, 3) is K.score_or
    assert K.select_kernel("or", 3, 3) is K.score_and
    assert K.select_kernel("and", None, 3) is K.score_and
    mid = K.select_kernel("or", 2, 3)
    assert mid is not K.score_or and mid is not K.score_and


def test_msm_cursor_paging(engines, oracle):
    """search_after composes with msm: page 2 via cursor == oracle rows
    10..20 under msm=2."""
    eng = engines["serve"]
    exp = oracle.search(QUERY, k=20, mode="or", msm=2)
    page1 = eng.search(
        QUERY, k=10, mode="or", minimum_should_match=2,
        with_meta=False, as_pandas=True,
    )
    cursor = (float(page1["score"].iloc[-1]), int(page1["doc_id"].iloc[-1]))
    page2 = eng.search(
        QUERY, k=10, mode="or", minimum_should_match=2, after=cursor,
        with_meta=False, as_pandas=True,
    )
    got = list(page1["doc_id"]) + list(page2["doc_id"])
    assert got == [d for d, _ in exp]


# ---- boosting query (positive/negative demotion) -------------------------


def _boosting_oracle(engines, pos, neg, nb, mode="and"):
    """Brute force from the local tier's own primitives: full positive
    match set scored, negative OR-match set demotes, resort."""
    loc = engines["local"]
    base = loc.search(pos, k=10**6, mode=mode, as_pandas=True,
                      with_meta=False)
    negset = set(
        loc.search(neg, k=10**6, mode="or", as_pandas=True,
                   with_meta=False)["doc_id"]
    )
    out = base.copy()
    out["score"] = [
        s * nb if d in negset else s
        for d, s in zip(out["doc_id"], out["score"])
    ]
    return out.sort_values(["score", "doc_id"],
                           ascending=[False, True], kind="mergesort")


@pytest.mark.parametrize("tier", ["local", "dist"])
@pytest.mark.parametrize("mode", ["and", "or"])
def test_boosting_matches_bruteforce(engines, tier, mode):
    want = _boosting_oracle(
        engines, "common_util helper", "slow", 0.3, mode=mode
    ).head(15)
    got = engines[tier].search_boosting(
        "common_util helper", "slow", 0.3, k=15, mode=mode, as_pandas=True
    )
    assert list(got["doc_id"]) == list(want["doc_id"]), tier
    assert np.allclose(got["score"].values, want["score"].values,
                       rtol=1e-9), tier


def test_boosting_demotes_not_excludes(engines):
    loc = engines["local"]
    n_plain = len(loc.search("common_util", k=10**6, as_pandas=True,
                             with_meta=False))
    n_boost = len(loc.search_boosting("common_util", "slow", 0.5, k=10**6,
                                      as_pandas=True))
    assert n_boost == n_plain  # nothing dropped


def test_boosting_absent_negative_is_plain_search(engines):
    loc = engines["local"]
    plain = loc.search("common_util", k=10, as_pandas=True)
    got = loc.search_boosting("common_util", "zzzqqqxyzzy", 0.5, k=10,
                              as_pandas=True)
    assert list(got["doc_id"]) == list(plain["doc_id"])


def test_boosting_validates_negative_boost(engines):
    loc = engines["local"]
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="negative_boost"):
            loc.search_boosting("a", "b", bad)


def test_boosting_with_filters_and_paging(engines):
    want = _boosting_oracle(engines, "common_util", "slow", 0.4)
    loc = engines["local"]
    meta = loc._local_meta.set_index("doc_id")
    want = want[[meta.loc[d, "lang"] == "py" for d in want["doc_id"]]]
    for tier in ("local", "dist"):
        got = engines[tier].search_boosting(
            "common_util", "slow", 0.4, k=5, offset=3,
            filters={"lang": "py"}, as_pandas=True,
        )
        exp = want.iloc[3:8]
        assert list(got["doc_id"]) == list(exp["doc_id"]), tier


def test_decay_modifier_math():
    """ES decay parametrization: the function evaluates to `decay` at
    distance scale from origin (after offset), 1 at the origin, and
    linear clamps to 0 beyond s = scale/(1-decay)."""
    import numpy as np
    import pytest as _pytest

    from gofias_spark.query.engine import SearchEngine

    for shape in ("gauss", "exp", "linear"):
        fv = SearchEngine._decay_modifier(shape, origin=100, scale=50,
                                          offset=0, decay=0.3)
        assert fv(np.array([100.0]))[0] == _pytest.approx(1.0)
        assert fv(np.array([150.0]))[0] == _pytest.approx(0.3)
        assert fv(np.array([50.0]))[0] == _pytest.approx(0.3)  # symmetric
    # offset widens the flat top
    fv = SearchEngine._decay_modifier("gauss", 100, 50, offset=20,
                                      decay=0.5)
    assert fv(np.array([115.0]))[0] == _pytest.approx(1.0)
    # linear hits exactly 0 at dist >= scale/(1-decay)
    fv = SearchEngine._decay_modifier("linear", 0, 50, decay=0.5)
    assert fv(np.array([100.0]))[0] == _pytest.approx(0.0)
    assert fv(np.array([200.0]))[0] == 0.0
    # missing field values are neutral
    import numpy as _np
    assert fv(_np.array([_np.nan]))[0] == 1.0
    for bad in (dict(scale=0), dict(decay=0.0), dict(decay=1.0),
                dict(offset=-1)):
        with _pytest.raises(ValueError):
            SearchEngine._decay_modifier(
                "gauss", 0, bad.get("scale", 1),
                bad.get("offset", 0), bad.get("decay", 0.5),
            )
    with _pytest.raises(ValueError):
        SearchEngine._decay_modifier("bogus", 0, 1)
