"""facets(): ES terms-aggregation analogue — tier parity vs a pandas
oracle on AND/OR/filtered/no-query paths."""

import re

import pandas as pd
import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=4, block_size=32)
Q = "const type"
QT = {"const", "type"}


def _toks(s: str) -> set[str]:
    return set(re.findall(r"[a-z0-9_]+", s.lower()))


def _expect(pdf: pd.DataFrame, match, field: str, k: int) -> pd.DataFrame:
    m = pdf[pdf["content"].map(match)]
    e = m[m[field].notna()].groupby(field).size().reset_index(name="cnt")
    e = (
        e.sort_values(["cnt", field], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
        .astype({"cnt": "int64"})
    )
    return e


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("facetidx"))
    docs = synth_corpus(spark, 400)
    build_segment(spark, docs, root, CFG)
    pdf = docs.toPandas()
    pdf["doclen"] = pdf["content"].map(
        lambda s: len(re.findall(r"[a-z0-9_]+", s.lower()))
    )
    return root, pdf


def _engines(spark, root):
    local = SearchEngine(spark, root)
    local.warm()
    serve = SearchEngine(spark, root)
    serve.warm(local_max_blocks=0)
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    return {"local": local, "serve": serve, "distributed": dist}


def test_facets_tier_parity(spark, corpus):
    root, pdf = corpus
    exp_and = _expect(pdf, lambda s: QT <= _toks(s), "lang", 5)
    exp_or = _expect(pdf, lambda s: bool(QT & _toks(s)), "lang", 5)
    assert len(exp_and) > 0
    for label, eng in _engines(spark, root).items():
        got = eng.facets("lang", Q, k=5)
        pd.testing.assert_frame_equal(got, exp_and), label
        got_or = eng.facets("lang", Q, mode="or", k=5)
        pd.testing.assert_frame_equal(got_or, exp_or), label


def test_facets_filtered(spark, corpus):
    root, pdf = corpus
    flt = {"doclen": {"gte": 40}}
    m = pdf[(pdf["doclen"] >= 40)]
    exp = _expect(m, lambda s: QT <= _toks(s), "lang", 5)
    for label, eng in _engines(spark, root).items():
        got = eng.facets("lang", Q, filters=flt, k=5)
        pd.testing.assert_frame_equal(got, exp), label


def test_facets_no_query(spark, corpus):
    root, pdf = corpus
    exp = _expect(pdf, lambda s: True, "lang", 3)
    eng = SearchEngine(spark, root)
    eng.warm()
    got = eng.facets("lang", k=3)
    pd.testing.assert_frame_equal(got, exp)
    # filtered, no query
    m = pdf[pdf["doclen"] >= 40]
    exp_f = _expect(m, lambda s: True, "lang", 3)
    got_f = eng.facets("lang", filters={"doclen": {"gte": 40}}, k=3)
    pd.testing.assert_frame_equal(got_f, exp_f)


def test_facets_empty_and_errors(spark, corpus):
    root, _ = corpus
    eng = SearchEngine(spark, root)
    eng.warm()
    assert len(eng.facets("lang", "zzznotaterm const")) == 0
    assert len(eng.facets("lang", Q, filters={"lang": []})) == 0
    with pytest.raises(ValueError):
        eng.facets("doc_id", Q)
    with pytest.raises(ValueError):
        eng.facets("nope_field", Q)


def _expect_hist(pdf: pd.DataFrame, match, interval: float) -> pd.DataFrame:
    import numpy as np

    m = pdf[pdf["content"].map(match)]
    b = np.floor(m["doclen"].to_numpy(dtype="float64") / interval) * interval
    g = pd.Series(b).value_counts()
    e = pd.DataFrame({"bucket": g.index.astype("float64"),
                      "cnt": g.values.astype("int64")})
    return e.sort_values("bucket").reset_index(drop=True)


def test_histogram_tier_parity(spark, corpus):
    root, pdf = corpus
    exp_and = _expect_hist(pdf, lambda s: QT <= _toks(s), 25)
    exp_or = _expect_hist(pdf, lambda s: bool(QT & _toks(s)), 25)
    assert len(exp_and) > 1
    for label, eng in _engines(spark, root).items():
        got = eng.histogram("doclen", 25, Q)
        pd.testing.assert_frame_equal(got, exp_and), label
        got_or = eng.histogram("doclen", 25, Q, mode="or")
        pd.testing.assert_frame_equal(got_or, exp_or), label


def test_histogram_no_query_and_filtered(spark, corpus):
    root, pdf = corpus
    eng = SearchEngine(spark, root)
    eng.warm()
    exp = _expect_hist(pdf, lambda s: True, 50)
    pd.testing.assert_frame_equal(eng.histogram("doclen", 50), exp)
    m = pdf[pdf["doclen"] >= 40]
    exp_f = _expect_hist(m, lambda s: QT <= _toks(s), 50)
    got_f = eng.histogram(
        "doclen", 50, Q, filters={"doclen": {"gte": 40}}
    )
    pd.testing.assert_frame_equal(got_f, exp_f)


def test_histogram_errors(spark, corpus):
    root, _ = corpus
    eng = SearchEngine(spark, root)
    eng.warm()
    with pytest.raises(ValueError):  # non-numeric field
        eng.histogram("lang", 10)
    with pytest.raises(ValueError):
        eng.histogram("doclen", 0)
    with pytest.raises(ValueError):  # bucket explosion fails loudly
        eng.histogram("doclen", 0.001, max_buckets=10)
    with pytest.raises(ValueError):  # ... on the no-query spark path too
        SearchEngine(spark, root, cache=False).histogram(
            "doclen", 0.001, max_buckets=10
        )
    assert len(eng.histogram("doclen", 25, "zzznotaterm const")) == 0


def test_field_stats_tier_parity(spark, corpus):
    root, pdf = corpus
    m = pdf[pdf["content"].map(lambda s: QT <= _toks(s))]["doclen"]
    exp = {"count": int(len(m)), "min": float(m.min()), "max": float(m.max()),
           "avg": float(m.sum()) / len(m), "sum": float(m.sum())}
    for label, eng in _engines(spark, root).items():
        got = eng.field_stats("doclen", Q)
        assert got["count"] == exp["count"], label
        assert got["min"] == exp["min"] and got["max"] == exp["max"], label
        assert abs(got["avg"] - exp["avg"]) < 1e-9, label
        assert got["sum"] == exp["sum"], label


def test_field_stats_no_query_filtered_empty(spark, corpus):
    root, pdf = corpus
    eng = SearchEngine(spark, root)
    eng.warm()
    st = eng.field_stats("doclen")
    assert st["count"] == len(pdf) and st["sum"] == float(pdf["doclen"].sum())
    m = pdf[pdf["doclen"] >= 40]["doclen"]
    st_f = eng.field_stats("doclen", filters={"doclen": {"gte": 40}})
    assert (st_f["count"], st_f["min"]) == (len(m), float(m.min()))
    z = eng.field_stats("doclen", "zzznotaterm const")
    assert z == {"count": 0, "min": None, "max": None, "avg": None,
                 "sum": 0.0}
    with pytest.raises(ValueError):
        eng.field_stats("lang")


def test_significant_terms_tier_parity(spark, corpus):
    """JLH scoring agrees between the driver-local kernel and the
    distributed full-postings pass, matches a pandas reference, and the
    query's own terms top the list (ES behavior)."""
    import re as _re

    root, pdf = corpus

    def ref(match, min_dc=3, k=8):
        matched = pdf[pdf["content"].map(match)]
        nm, n = float(len(matched)), float(len(pdf))
        from collections import Counter

        fgc = Counter(t for s in matched["content"] for t in _toks(s))
        bgc = Counter(t for s in pdf["content"] for t in _toks(s))
        rows = []
        for t, h in fgc.items():
            fg, bg = h / nm, bgc[t] / n
            if h >= min_dc and fg > bg:
                rows.append((t, h, (fg - bg) * (fg / bg)))
        rows.sort(key=lambda x: (-x[2], x[0]))
        return rows[:k]

    exp = ref(lambda s: QT <= _toks(s))
    local = SearchEngine(spark, root)
    local.warm()
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    for eng in (local, dist):
        got = eng.significant_terms(Q, k=8)
        rows = [
            (r["term"], int(r["hits"]), round(r["score"], 9))
            for _, r in got.iterrows()
        ]
        assert rows == [(t, h, round(s, 9)) for t, h, s in exp]
    assert {exp[0][0], exp[1][0]} == QT  # query terms dominate (ES-like)
    # filters compose (right-side cogroup on the distributed path):
    # foreground hits count only filter-surviving matched docs
    got_f = dist.significant_terms(Q, k=5, filters={"doclen": {"gte": 40}})
    from collections import Counter

    m = pdf[pdf["doclen"] >= 40]
    fgc = Counter(
        t
        for s in m[m["content"].map(lambda s: QT <= _toks(s))]["content"]
        for t in _toks(s)
    )
    assert len(got_f) > 0
    assert all(int(r["hits"]) == fgc[r["term"]] for _, r in got_f.iterrows())


def test_facets_respects_tombstones(spark, corpus):
    """Deleted docs must drop out of facet counts on every tier."""
    from gofias_spark.index.merge import apply_delta

    root, pdf = corpus
    import shutil
    import tempfile

    snap = tempfile.mkdtemp(prefix="facetdel_")
    shutil.rmtree(snap)
    shutil.copytree(root, snap)
    base = SearchEngine(spark, snap)
    base.warm()
    top = base.facets("lang", Q, k=1)
    victim_lang = top.iloc[0]["lang"]
    # delete every matching doc of the top lang
    m = pdf[
        pdf["content"].map(lambda s: QT <= _toks(s))
        & (pdf["lang"] == victim_lang)
    ]
    deletes = spark.createDataFrame(
        m[["repo", "path"]], "repo string, path string"
    )
    apply_delta(spark, snap, upserts=None, deletes=deletes, cfg=CFG)
    exp = _expect(
        pdf[pdf["lang"] != victim_lang],
        lambda s: QT <= _toks(s),
        "lang",
        5,
    )
    for label, eng in _engines(spark, snap).items():
        got = eng.facets("lang", Q, k=5)
        pd.testing.assert_frame_equal(got, exp), label
        assert victim_lang not in got["lang"].tolist()


def test_sampler_facets_restricts_to_top_scores(spark, tmp_path_factory):
    """sampler_facets counts only the top-shard_size scoring matches
    (brute-force check against search order) and the diversified variant
    caps docs per value in score order."""
    from gofias_spark.config import IndexConfig
    from gofias_spark.corpus import synth_corpus
    from gofias_spark.index.build import build_segment
    from gofias_spark.query.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("sampleridx"))
    build_segment(spark, synth_corpus(spark, 120), root,
                  IndexConfig(n_buckets=3, block_size=16))
    eng = SearchEngine(spark, root)
    eng.warm()
    try:
        shard = 15
        top = eng.search("common_util", k=shard, with_meta=True).collect()
        assert len(top) == shard
        want: dict = {}
        for r in top:
            want[r["lang"]] = want.get(r["lang"], 0) + 1
        got = eng.sampler_facets("lang", "common_util", shard_size=shard,
                                 k=100)
        assert {r["lang"]: int(r["cnt"])
                for _, r in got.iterrows()} == want
        # order contract: cnt desc, value asc
        pairs = [(int(r["cnt"]), r["lang"]) for _, r in got.iterrows()]
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
        # diversified: max 1 per repo, in score order
        seen = set()
        want_div: dict = {}
        for r in top:
            if r["repo"] in seen:
                continue
            seen.add(r["repo"])
            want_div[r["lang"]] = want_div.get(r["lang"], 0) + 1
        got_div = eng.sampler_facets(
            "lang", "common_util", shard_size=shard, k=100,
            diversify_field="repo", max_docs_per_value=1,
        )
        assert {r["lang"]: int(r["cnt"])
                for _, r in got_div.iterrows()} == want_div
        # validation
        import pytest as _pytest
        with _pytest.raises(ValueError):
            eng.sampler_facets("doc_id", "x")
        with _pytest.raises(ValueError):
            eng.sampler_facets("lang", "x", shard_size=0)
    finally:
        eng.close()
