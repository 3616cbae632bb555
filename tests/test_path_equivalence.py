"""Randomized three-path equivalence: the local searcher, the serve tier
(driver-side pyarrow), and the distributed cogroup/mapInPandas paths must
return IDENTICAL results for the same index and query — across random
corpora, query shapes, modes, filters, sorts, and paging. This is the
end-to-end complement to tests/test_wand_stress.py (kernel vs brute
force) and tests/test_serve.py (hand-picked cases)."""

import random

import pytest
from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "toolong_identifier_name", "x", "common_util",
]


def _random_docs(rng, n):
    rows = []
    for i in range(n):
        n_tok = rng.randint(1, 30)
        content = " ".join(rng.choice(WORDS) for _ in range(n_tok))
        lang = rng.choice(["py", "go", None])
        rows.append((f"org/r{i % 3}", f"src/f{i}.py", f"c{i}", lang, content))
    return rows


@pytest.fixture(scope="module")
def trio(spark, tmp_path_factory):
    rng = random.Random(12345)
    docs = spark.createDataFrame(
        _random_docs(rng, 300),
        "repo string, path string, commit string, lang string, content string",
    )
    root = str(tmp_path_factory.mktemp("eqidx"))
    build_segment(spark, docs, root, IndexConfig(n_buckets=3, block_size=8))
    local = SearchEngine(spark, root, cache=False)
    local.warm()
    assert local._local_blocks is not None
    served = SearchEngine(spark, root)
    served.warm(local_max_blocks=0)
    assert served._serve is not None
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    return local, served, dist


def _key(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _sorted_key(df):
    return [
        (r["doc_id"], r["lang"], round(r["score"], 9)) for r in df.collect()
    ]


def test_three_paths_agree_randomized(trio):
    local, served, dist = trio
    rng = random.Random(99)
    filters_pool = [
        None,
        {"lang": "py"},
        {"lang": ["py", "go"]},
        {"lang": {"neq": "go"}},
        {"lang": {"exists": True}},
        {"lang": {"exists": False}},
        {"doclen": {"gte": 5, "lt": 25}},
        {"path_prefix": "src/f1"},
        {"repo": "org/r1", "doclen": {"gt": 2}},
    ]
    for trial in range(40):
        n_terms = rng.randint(1, 3)
        q = " ".join(rng.choice(WORDS) for _ in range(n_terms))
        mode = rng.choice(["and", "or"])
        k = rng.choice([1, 3, 10])
        offset = rng.choice([0, 0, 2])
        f = rng.choice(filters_pool)
        kw = dict(k=k, offset=offset, mode=mode, filters=f)
        a = _key(local.search(q, **kw))
        b = _key(served.search(q, **kw))
        c = _key(dist.search(q, **kw))
        assert a == b == c, (trial, q, kw)


def test_three_paths_agree_sorted_randomized(trio):
    local, served, dist = trio
    rng = random.Random(7)
    for trial in range(12):
        q = rng.choice(["common_util", "alpha beta", "kappa"])
        f = rng.choice([None, {"doclen": {"gte": 3}}, {"lang": ["py", "go"]}])
        sb = rng.choice(
            [
                [("lang", "asc"), ("_score", "desc")],
                [("doclen", "desc"), ("_score", "desc")],
                [("lang", "desc"), ("doclen", "asc")],
            ]
        )
        kw = dict(k=5, mode="or", filters=f, sort_by=sb)
        a = _sorted_key(local.search(q, **kw).select("doc_id", "lang", "score"))
        b = _sorted_key(
            served.search(q, **kw).select("doc_id", "lang", "score")
        )
        c = _sorted_key(dist.search(q, **kw).select("doc_id", "lang", "score"))
        assert a == b == c, (trial, q, kw)


def test_three_paths_agree_must_not_randomized(trio):
    local, served, dist = trio
    rng = random.Random(41)
    for trial in range(25):
        q = " ".join(
            rng.choice(WORDS) for _ in range(rng.randint(1, 2))
        )
        mn = " ".join(
            rng.choice(WORDS + ["unindexed_zzz"])
            for _ in range(rng.randint(1, 2))
        )
        mode = rng.choice(["and", "or"])
        f = rng.choice([None, {"lang": "py"}, {"doclen": {"gte": 5}}])
        kw = dict(k=10, mode=mode, filters=f, must_not=mn)
        a = _key(local.search(q, **kw))
        b = _key(served.search(q, **kw))
        c = _key(dist.search(q, **kw))
        assert a == b == c, (trial, q, kw)


def test_three_paths_agree_must_not_sorted(trio):
    local, served, dist = trio
    kw = dict(
        k=5, mode="or", must_not="beta",
        sort_by=[("lang", "asc"), ("_score", "desc")],
    )
    a = _sorted_key(
        local.search("common_util alpha", **kw).select("doc_id", "lang", "score")
    )
    b = _sorted_key(
        served.search("common_util alpha", **kw).select("doc_id", "lang", "score")
    )
    c = _sorted_key(
        dist.search("common_util alpha", **kw).select("doc_id", "lang", "score")
    )
    assert a == b == c
    assert len(a) > 0


def test_must_not_semantics(trio):
    """must_not = pure exclusion: survivors keep IDENTICAL scores, the
    removed ids are exactly the docs matching any negated term, an
    unindexed negated term excludes nothing, and a term both required
    (mode=and) and negated yields empty."""
    local, *_ = trio
    base = {
        r["doc_id"]: round(r["score"], 9)
        for r in local.search("alpha", mode="or", k=400).collect()
    }
    neg_ids = {
        r["doc_id"] for r in local.search("beta", mode="or", k=400).collect()
    }
    got = {
        r["doc_id"]: round(r["score"], 9)
        for r in local.search(
            "alpha", mode="or", k=400, must_not="beta"
        ).collect()
    }
    assert set(got) == set(base) - neg_ids
    assert all(got[i] == base[i] for i in got)
    noop = {
        r["doc_id"]: round(r["score"], 9)
        for r in local.search(
            "alpha", mode="or", k=400, must_not="unindexed_zzz"
        ).collect()
    }
    assert noop == base
    assert (
        local.search("alpha beta", mode="and", k=10, must_not="beta").count()
        == 0
    )


def test_search_after_walks_equal_offset_pages(trio):
    """Cursor paging (ES search_after analogue): walking pages via the
    (score, doc_id) cursor of each page's last hit reconstructs offset
    paging exactly, on all three tiers, for AND and OR modes."""
    local, served, dist = trio
    for eng in (local, served, dist):
        for mode in ("and", "or"):
            full = _key(eng.search("common_util alpha", k=60, mode=mode))
            assert len(full) > 10
            walked, cursor = [], None
            while True:
                page = eng.search(
                    "common_util alpha", k=7, mode=mode, after=cursor,
                ).collect()
                if not page:
                    break
                walked.extend(
                    (r["doc_id"], round(r["score"], 9)) for r in page
                )
                cursor = (page[-1]["score"], page[-1]["doc_id"])
                if len(walked) >= len(full):
                    break
            assert walked[: len(full)] == full, (type(eng), mode)


def test_search_after_composes_with_filters_and_must_not(trio):
    local, served, dist = trio
    kw = dict(k=5, mode="or", filters={"doclen": {"gte": 5}},
              must_not="beta")
    p1 = local.search("common_util alpha", **kw).collect()
    assert len(p1) == 5
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    a = _key(local.search("common_util alpha", after=cursor, **kw))
    b = _key(served.search("common_util alpha", after=cursor, **kw))
    c = _key(dist.search("common_util alpha", after=cursor, **kw))
    offset_page = _key(
        local.search("common_util alpha", offset=5, **kw)
    )
    assert a == b == c == offset_page
    assert len(a) > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        local.search("alpha", k=3, offset=2, after=cursor)
    with _pytest.raises(ValueError):
        local.search("alpha", k=3, after=cursor,
                     sort_by=[("lang", "asc")])


def test_more_like_this_three_paths(trio):
    """MLT derives the same term set on every tier (selection is
    driver-side), rides the tiered OR search, and never returns the
    source doc."""
    local, served, dist = trio
    src = local.search("common_util", k=1).collect()[0]["doc_id"]
    a = _key(local.more_like_this(src, k=8, min_doc_freq=2))
    b = _key(served.more_like_this(src, k=8, min_doc_freq=2))
    c = _key(dist.more_like_this(src, k=8, min_doc_freq=2))
    assert a == b == c
    assert len(a) > 0
    assert src not in [d for d, _ in a]
    # unknown doc -> empty, no error
    assert local.more_like_this(10**15, k=5).count() == 0


def test_counts_agree_randomized(trio):
    local, served, dist = trio
    rng = random.Random(3)
    for _ in range(10):
        q = " ".join(
            rng.choice(WORDS) for _ in range(rng.randint(1, 2))
        )
        f = rng.choice([None, {"lang": "py"}, {"doclen": {"gte": 10}}])
        mn = rng.choice([None, "beta", "beta kappa", "unindexed_zzz"])
        kw = dict(filters=f, must_not=mn)
        n = local.count(q, **kw)
        assert n == served.count(q, **kw) == dist.count(q, **kw), (q, kw)
        # count == number of search hits under the same bool
        assert n == len(
            local.search(q, k=400, mode="and", filters=f, must_not=mn)
            .collect()
        ), (q, kw)
    assert local.count("alpha", must_not="alpha") == 0
