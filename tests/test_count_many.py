"""count_many: named counts for a batch of queries in ONE postings pass
(ES ``filters`` aggregation / _msearch count analogue). The gate is
equivalence with engine.count per query on every tier, plus the
zero-bucket contract (absent-term queries still bucket, cnt 0).
"""

import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

DOCS = [
    ("d0", "en", "alpha beta gamma"),
    ("d1", "en", "alpha beta"),
    ("d2", "de", "alpha gamma"),
    ("d3", "de", "beta gamma gamma"),
    ("d4", "fr", "delta"),
    ("d5", "en", "alpha alpha"),
]

QUERIES = {
    "ab": "alpha beta",
    "g": "gamma",
    "ad": "alpha delta",
    "zz": "zzzmissing",
}


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cmidx"))
    df = spark.createDataFrame(
        [("r", p, "c", lang, t) for p, lang, t in DOCS],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    build_segment(spark, df, root, IndexConfig(n_buckets=2, block_size=8))
    warm = SearchEngine(spark, root)
    warm.warm()
    cold = SearchEngine(spark, root)
    return warm, cold


def _as_dict(pdf):
    return dict(zip(pdf["query"], pdf["cnt"]))


@pytest.mark.parametrize("mode", ["and", "or"])
def test_matches_per_query_count(engines, mode):
    warm, cold = engines
    for eng in (warm, cold):
        got = _as_dict(eng.count_many(QUERIES, mode=mode))
        assert set(got) == set(QUERIES)
        for qid, text in QUERIES.items():
            if mode == "and":
                expect = eng.count(text)
            else:  # OR count = docs matching ANY live term
                terms = [
                    t for t in text.split() if eng.count(t) > 0
                ]
                ids = set()
                for t in terms:
                    ids |= {
                        r["doc_id"]
                        for r in eng.search(t, k=100, with_meta=False)
                        .select("doc_id").collect()
                    }
                expect = len(ids)
            assert got[qid] == expect, (qid, mode)


def test_zero_bucket_contract(engines):
    warm, _ = engines
    got = _as_dict(warm.count_many(QUERIES))
    assert got["zz"] == 0
    assert got["ad"] == 0  # conjunctive with a present + absent term


def test_filters(engines):
    warm, cold = engines
    for eng in (warm, cold):
        got = _as_dict(
            eng.count_many(QUERIES, filters={"lang": "en"})
        )
        for qid, text in QUERIES.items():
            assert got[qid] == eng.count(text, filters={"lang": "en"}), qid


def test_list_input_and_empty(engines):
    warm, _ = engines
    got = _as_dict(warm.count_many(["alpha", "gamma"]))
    assert got == {"alpha": 4, "gamma": 3}
    empty = warm.count_many({})
    assert list(empty.columns) == ["query", "cnt"] and len(empty) == 0


def test_impossible_filter_short_circuits(engines):
    warm, _ = engines
    got = _as_dict(warm.count_many(QUERIES, filters={"lang": []}))
    assert set(got.values()) == {0}


def test_adjacency_matrix(engines):
    warm, _ = engines
    out = warm.adjacency_matrix({"a": "alpha", "b": "beta", "d": "delta"})
    got = _as_dict(out)
    # singles always bucket, even at 0 hits for their intersections
    assert got["a"] == 4 and got["b"] == 3 and got["d"] == 1
    # alpha AND beta = d0, d1
    assert got["a&b"] == 2
    # empty intersections (beta&delta, alpha&delta) are omitted, ES-style
    assert "b&d" not in got and "a&d" not in got


def test_adjacency_matrix_rejects_separator_key(engines):
    warm, _ = engines
    with pytest.raises(ValueError):
        warm.adjacency_matrix({"a&b": "alpha"})
