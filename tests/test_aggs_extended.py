"""Cardinality / percentiles / range aggregations: every tier must agree
with a brute-force computation over the collected matching docs, and the
three aggs share ONE grouped value-count plan (no per-range or per-p jobs).

ES analogues: cardinality (HLL++ — ours is exact by default with an
opt-in approx_count_distinct path), percentiles (t-digest — ours is exact
linear interpolation, numpy 'linear' == DuckDB quantile_cont), range
(from-inclusive / to-exclusive, overlapping ranges counted independently).
"""

import numpy as np
import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=5, block_size=16)
Q = "merge_6 update_7"  # ~120 matching docs of 400 under OR, ~25 AND


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aggidx"))
    build_segment(spark, synth_corpus(spark, 400), root, CFG)
    return root


@pytest.fixture(scope="module")
def engines(spark, root):
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    serve = SearchEngine(spark, root)
    serve.warm(local_max_blocks=0)
    local = SearchEngine(spark, root, cache=False)
    local.warm()
    return {"dist": dist, "serve": serve, "local": local}


@pytest.fixture(scope="module")
def matched_meta(engines):
    """Brute-force truth: meta rows of the docs matching Q (and-mode)."""
    eng = engines["local"]
    pdf = eng.search(Q, k=100_000, as_pandas=True)
    meta = eng._local_meta.set_index("doc_id")
    return meta.loc[list(pdf["doc_id"])]


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_cardinality_matches_bruteforce(engines, matched_meta, tier):
    for field in ("lang", "repo", "doclen"):
        got = engines[tier].cardinality(field, Q)
        assert got == matched_meta[field].nunique(), (tier, field)


def test_cardinality_corpus_wide(engines):
    eng = engines["local"]
    # synth corpus: repo = org{i%7}/project{i%23} -> 7*23 distinct
    assert eng.cardinality("repo") == 161
    # approx HLL++ path: exact at this cardinality up to hash collisions;
    # assert the ES-grade bound (rsd 0.05 -> generous 20% here)
    approx = eng.cardinality("path", exact=False)
    exact = eng.cardinality("path")
    assert abs(approx - exact) <= max(2, 0.2 * exact)


def test_cardinality_approx_rejects_query(engines):
    with pytest.raises(ValueError, match="query=None"):
        engines["local"].cardinality("lang", Q, exact=False)


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_percentiles_match_numpy(engines, matched_meta, tier):
    ps = (0.0, 25.0, 50.0, 75.0, 95.0, 100.0)
    got = engines[tier].percentiles("doclen", ps, Q)
    vals = matched_meta["doclen"].to_numpy(dtype=np.float64)
    for p in ps:
        assert got[p] == pytest.approx(
            float(np.percentile(vals, p)), rel=1e-12
        ), (tier, p)


def test_percentiles_empty_match(engines):
    got = engines["local"].percentiles("doclen", (50.0,), "zzz_absent_term")
    assert got == {50.0: None}


def test_percentiles_validation(engines):
    eng = engines["local"]
    with pytest.raises(ValueError, match="not numeric"):
        eng.percentiles("lang", (50.0,), Q)
    with pytest.raises(ValueError, match="outside"):
        eng.percentiles("doclen", (101.0,), Q)
    with pytest.raises(ValueError, match="unknown field"):
        eng.percentiles("nope", (50.0,), Q)


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_range_agg_matches_bruteforce(engines, matched_meta, tier):
    vals = matched_meta["doclen"].to_numpy(dtype=np.float64)
    ranges = [(None, 100.0), (100.0, 200.0), (150.0, None), (None, None)]
    pdf = engines[tier].range_agg("doclen", ranges, Q)
    assert list(pdf["range"]) == ["*-100.0", "100.0-200.0", "150.0-*", "*-*"]
    exp = [
        int((vals < 100).sum()),
        int(((vals >= 100) & (vals < 200)).sum()),
        int((vals >= 150).sum()),  # overlapping range counts independently
        int(vals.size),
    ]
    assert list(pdf["cnt"]) == exp, tier


def test_range_agg_validation(engines):
    eng = engines["local"]
    with pytest.raises(ValueError, match="non-empty"):
        eng.range_agg("doclen", [], Q)
    with pytest.raises(ValueError, match="not numeric"):
        eng.range_agg("lang", [(None, None)], Q)


def test_aggs_compose_with_filters(engines, matched_meta):
    """filters narrow the matched set before aggregation on every tier."""
    sub = matched_meta[matched_meta["lang"] == "py"]
    for tier in ("dist", "serve", "local"):
        eng = engines[tier]
        f = {"lang": "py"}
        assert eng.cardinality("repo", Q, filters=f) == sub["repo"].nunique()
        got = eng.percentiles("doclen", (50.0,), Q, filters=f)
        assert got[50.0] == pytest.approx(
            float(np.percentile(sub["doclen"].to_numpy(float), 50.0))
        )


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_top_hits_matches_bruteforce(engines, tier):
    """Per-group top-k == brute force over all scored matches; groups
    ordered by total count desc then value asc; cnt = ES bucket doc_count."""
    eng = engines[tier]
    got = eng.top_hits("lang", Q, 2, groups=3, mode="or")
    loc = engines["local"]
    pdf = loc.search(Q, k=100_000, mode="or", as_pandas=True)
    meta = loc._local_meta.set_index("doc_id")
    pdf = pdf.assign(lang=meta.loc[list(pdf["doc_id"]), "lang"].values)
    pdf = pdf.dropna(subset=["lang"])
    cnts = pdf.groupby("lang").size()
    top_groups = cnts.loc[sorted(cnts.index)].sort_values(
        ascending=False, kind="mergesort"
    ).head(3)
    exp_rows = []
    for g in top_groups.index:
        sub = pdf[pdf["lang"] == g].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(2)
        for _, r in sub.iterrows():
            exp_rows.append((g, int(top_groups[g]), int(r["doc_id"])))
    assert [
        (r["lang"], int(r["cnt"]), int(r["doc_id"]))
        for _, r in got.iterrows()
    ] == exp_rows, tier


def test_top_hits_group_cap_and_validation(engines):
    eng = engines["local"]
    one = eng.top_hits("lang", Q, 2, groups=1, mode="or")
    assert one["lang"].nunique() == 1
    with pytest.raises(ValueError, match="unknown field"):
        eng.top_hits("nope", Q)
    with pytest.raises(ValueError, match=">= 1"):
        eng.top_hits("lang", Q, 0)
    assert len(eng.top_hits("lang", "zzz_absent_term")) == 0


def test_top_hits_collapse_is_top1_per_group(engines):
    """k_per_group=1 == ES field collapsing: one best hit per group."""
    got = engines["local"].top_hits("lang", Q, 1, groups=10, mode="or")
    assert got["lang"].is_unique


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_terms_stats_matches_bruteforce(engines, matched_meta, tier):
    got = engines[tier].terms_stats("lang", "doclen", Q, k=10)
    want = (
        matched_meta.dropna(subset=["lang"])
        .groupby("lang")["doclen"]
        .agg(cnt="size", vc="count", mn="min", mx="max", sm="sum")
        .reset_index()
        .sort_values(["cnt", "lang"], ascending=[False, True],
                     kind="mergesort")
    )
    assert list(got["lang"]) == list(want["lang"]), tier
    assert list(got["cnt"]) == list(want["cnt"]), tier
    assert list(got["vc"]) == list(want["vc"]), tier
    assert np.allclose(got["min"], want["mn"].astype(float))
    assert np.allclose(got["max"], want["mx"].astype(float))
    assert np.allclose(got["sum"], want["sm"].astype(float))
    assert np.allclose(
        got["avg"], want["sm"].astype(float) / want["vc"].astype(float)
    )


def test_terms_stats_validation_and_filters(engines, matched_meta):
    eng = engines["local"]
    with pytest.raises(ValueError, match="unknown field"):
        eng.terms_stats("bogus", "doclen", Q)
    with pytest.raises(ValueError, match="not numeric"):
        eng.terms_stats("lang", "repo", Q)
    with pytest.raises(ValueError, match="must differ"):
        eng.terms_stats("doclen", "doclen", Q)
    f = {"doclen": {"gte": 100}}
    got = eng.terms_stats("lang", "doclen", Q, filters=f)
    sub = matched_meta[matched_meta["doclen"] >= 100]
    want_cnt = sub.groupby("lang").size()
    assert {r[0]: r[1] for r in got[["lang", "cnt"]].itertuples(index=False)} \
        == want_cnt.to_dict()


def test_terms_stats_corpus_wide_no_query(engines, spark):
    eng = engines["local"]
    got = eng.terms_stats("lang", "doclen", None, k=3)
    meta = eng._local_meta
    want = (
        meta.groupby("lang")["doclen"]
        .agg(cnt="size", sm="sum")
        .reset_index()
        .sort_values(["cnt", "lang"], ascending=[False, True],
                     kind="mergesort")
        .head(3)
    )
    assert list(got["lang"]) == list(want["lang"])
    assert np.allclose(got["sum"], want["sm"].astype(float))


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_composite_agg_pages_cover_all_buckets(engines, matched_meta, tier):
    eng = engines[tier]
    want = (
        matched_meta.dropna(subset=["repo"]).groupby("repo").size()
        .sort_index()
    )
    pages, after = [], None
    while True:
        page = eng.composite_agg("repo", size=7, after=after, query=Q)
        if not len(page):
            break
        pages.append(page)
        after = page["repo"].iloc[-1]
    import pandas as pd

    walked = pd.concat(pages, ignore_index=True)
    assert list(walked["repo"]) == list(want.index), tier
    assert list(walked["cnt"]) == list(want.values), tier
    # pages are disjoint and value-ascending
    assert walked["repo"].is_monotonic_increasing
    assert walked["repo"].is_unique


def test_composite_agg_unfiltered_and_numeric_after(engines):
    eng = engines["local"]
    p1 = eng.composite_agg("doclen", size=5)
    p2 = eng.composite_agg("doclen", size=5, after=p1["doclen"].iloc[-1])
    assert p2["doclen"].min() > p1["doclen"].max()
    meta = eng._local_meta
    want = meta.groupby("doclen").size().sort_index()
    assert list(p1["doclen"]) == list(want.index[:5])
    assert list(p1["cnt"]) == list(want.values[:5])


def test_suggest_terms_and_complete(engines):
    import re

    eng = engines["local"]
    # brute-force over the resident vocabulary
    vocab = eng._stats_cache
    assert vocab

    def lev1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        s, t = (a, b) if la < lb else (b, a)
        for i in range(len(t)):
            if t[:i] + t[i + 1:] == s:
                return True
        return False

    got = eng.suggest_terms("merge_6x", k=5)
    want = sorted(
        ((t, n) for t, n in vocab.items() if lev1(t, "merge_6x")),
        key=lambda p: (-p[1], p[0]),
    )[:5]
    assert list(got.itertuples(index=False, name=None)) == want
    assert "merge_6x" not in set(got["term"])

    got = eng.complete_prefix("merge_6", k=5)
    want = sorted(
        ((t, n) for t, n in vocab.items() if t.startswith("merge_6")),
        key=lambda p: (-p[1], p[0]),
    )[:5]
    assert list(got.itertuples(index=False, name=None)) == want

    # cold tier (no stats cache): StartsWith-pruned dictionary scan
    dist = engines["dist"]
    if dist._stats_cache is None:
        got_cold = dist.complete_prefix("merge_6", k=5)
        assert list(got_cold.itertuples(index=False, name=None)) == want

    with pytest.raises(ValueError, match="single token"):
        eng.suggest_terms("two words")
    with pytest.raises(ValueError, match="non-empty"):
        eng.complete_prefix("")


# ---- rare_terms / multi_terms -------------------------------------------


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_rare_terms_matches_bruteforce(engines, matched_meta, tier):
    got = engines[tier].rare_terms("doclen", Q, max_doc_count=3)
    vc = matched_meta["doclen"].value_counts()
    want = vc[vc <= 3].reset_index()
    want.columns = ["doclen", "cnt"]
    want = want.sort_values(["cnt", "doclen"],
                            ascending=[True, True]).reset_index(drop=True)
    assert got["doclen"].tolist() == want["doclen"].tolist(), tier
    assert got["cnt"].tolist() == want["cnt"].tolist(), tier


def test_rare_terms_max_buckets_and_validation(engines):
    eng = engines["local"]
    capped = eng.rare_terms("doclen", Q, max_doc_count=10, max_buckets=3)
    assert len(capped) <= 3
    with pytest.raises(ValueError, match="max_doc_count"):
        eng.rare_terms("doclen", Q, max_doc_count=0)
    with pytest.raises(ValueError, match="unknown field"):
        eng.rare_terms("bogus", Q)


@pytest.mark.parametrize("tier", ["dist", "local"])
def test_multi_terms_matches_bruteforce(engines, matched_meta, tier):
    got = engines[tier].multi_terms(["lang", "repo"], Q, k=12)
    want = (
        matched_meta.dropna(subset=["lang", "repo"])
        .groupby(["lang", "repo"])
        .size()
        .reset_index(name="cnt")
        .sort_values(["cnt", "lang", "repo"],
                     ascending=[False, True, True])
        .head(12)
        .reset_index(drop=True)
    )
    assert got[["lang", "repo"]].values.tolist() == \
        want[["lang", "repo"]].values.tolist(), tier
    assert got["cnt"].tolist() == want["cnt"].tolist(), tier


def test_multi_terms_no_query_counts_all_docs(engines):
    eng = engines["local"]
    got = eng.multi_terms(["lang", "repo"], k=1000)
    assert int(got["cnt"].sum()) == len(eng._local_meta)


def test_multi_terms_validation(engines):
    eng = engines["local"]
    with pytest.raises(ValueError, match=">= 2 fields"):
        eng.multi_terms(["lang"])
    with pytest.raises(ValueError, match="distinct"):
        eng.multi_terms(["lang", "lang"])
    with pytest.raises(ValueError, match="unknown field"):
        eng.multi_terms(["lang", "bogus"])


def test_multi_terms_unmatched_query_is_empty(engines):
    got = engines["local"].multi_terms(["lang", "repo"], "zzzqqqxyzzy")
    assert len(got) == 0


# ---- constant_score ------------------------------------------------------


@pytest.mark.parametrize("tier", ["dist", "local"])
def test_constant_score_matches_and_pages(engines, matched_meta, tier):
    eng = engines[tier]
    all_ids = sorted(matched_meta.index)
    got = eng.search_constant_score(Q, boost=2.5, k=10**6, as_pandas=True)
    assert list(got["doc_id"]) == all_ids, tier
    assert (got["score"] == 2.5).all()
    # stable doc_id-asc pagination
    p1 = eng.search_constant_score(Q, k=5, as_pandas=True)
    p2 = eng.search_constant_score(Q, k=5, offset=5, as_pandas=True)
    assert list(p1["doc_id"]) + list(p2["doc_id"]) == all_ids[:10]


def test_constant_score_filter_only(engines):
    eng = engines["local"]
    got = eng.search_constant_score(
        filters={"lang": "py"}, k=10**6, as_pandas=True
    )
    meta = eng._local_meta
    assert len(got) == int((meta["lang"] == "py").sum())
    assert (got["score"] == 1.0).all()


def test_constant_score_empty_and_impossible(engines):
    eng = engines["local"]
    assert len(eng.search_constant_score("zzzqqq", as_pandas=True)) == 0
    assert len(eng.search_constant_score(Q, filters={"lang": []},
                                         as_pandas=True)) == 0


# ---- percentile_ranks / mad ---------------------------------------------


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_percentile_ranks_matches_bruteforce(engines, matched_meta, tier):
    vals = matched_meta["doclen"].to_numpy(dtype=float)
    probes = [float(np.min(vals)), float(np.median(vals)),
              float(np.max(vals)), float(np.max(vals)) + 10.0, -5.0]
    got = engines[tier].percentile_ranks("doclen", probes, Q)
    for v in probes:
        want = round(100.0 * (vals <= v).sum() / vals.size, 6)
        assert got[v] == want, (tier, v)
    assert got[probes[3]] == 100.0 and got[-5.0] == 0.0


@pytest.mark.parametrize("tier", ["dist", "serve", "local"])
def test_mad_matches_numpy(engines, matched_meta, tier):
    vals = matched_meta["doclen"].to_numpy(dtype=float)
    med = np.quantile(vals, 0.5, method="linear")
    want = round(float(np.quantile(np.abs(vals - med), 0.5,
                                   method="linear")), 6)
    assert engines[tier].mad("doclen", Q) == want, tier


def test_percentile_ranks_and_mad_empty(engines):
    eng = engines["local"]
    assert eng.mad("doclen", "zzzqqq") is None
    assert eng.percentile_ranks("doclen", [1.0], "zzzqqq") == {1.0: None}
    with pytest.raises(ValueError, match="non-empty"):
        eng.percentile_ranks("doclen", [], Q)


# ---- weighted_avg / matrix_stats ----------------------------------------

from gofias_spark.operators.stats import (  # noqa: E402
    matrix_stats,
    weighted_avg,
)


def test_weighted_avg_bruteforce(spark):
    rows = [(1.0, 2.0), (3.0, 1.0), (10.0, None), (None, 5.0), (4.0, 3.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    out = weighted_avg(df, "v", "w").collect()[0]
    want = round((1 * 2 + 3 * 1 + 4 * 3) / (2 + 1 + 3), 6)
    assert out["weighted_avg"] == want and out["n"] == 3


def test_matrix_stats_bruteforce(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(10, 2, 200)
    y = 0.5 * x + rng.normal(0, 1, 200)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    out = matrix_stats(df, "x", "y").collect()[0]
    assert out["n"] == 200
    assert abs(out["mean_x"] - x.mean()) < 1e-6
    assert abs(out["var_y"] - y.var()) < 1e-6
    assert abs(out["covariance"] - np.cov(x, y, bias=True)[0, 1]) < 1e-6
    assert abs(out["correlation"] - np.corrcoef(x, y)[0, 1]) < 1e-6
