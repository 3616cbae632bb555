"""Multi-field search (ES multi_match best_fields/most_fields): per-field
sub-indexes must assign IDENTICAL doc_ids (deterministic key-hash
assignment is text-independent), and the combined ranking must be
rank- and score-identical to a dual pure-Python oracle computing per-field
BM25 (field-local df/avgdl/dl, exactly Lucene's per-field statistics)."""

import numpy as np
import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.query.multifield import MultiFieldEngine, build_fielded

from .oracle import OracleIndex

CFG = IndexConfig(n_buckets=4, block_size=16)
# content tokens + path tokens (synth paths look like src/index/search_5.py)
QUERY = "index search common_util"


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mfidx"))
    build_fielded(spark, synth_corpus(spark, 300), root, CFG,
                  fields=("content", "path"))
    return root


@pytest.fixture(scope="module")
def engines(spark, root):
    local = MultiFieldEngine(spark, root)
    local.warm()
    assert all(e._local_blocks is not None for e in local.engines.values())
    dist = MultiFieldEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    assert all(e._serve is None and e._local_blocks is None
               for e in dist.engines.values())
    return {"local": local, "dist": dist}


@pytest.fixture(scope="module")
def oracles(spark, engines):
    eng = engines["local"].engines["content"]
    rows = eng.doc_meta.select("doc_id", "content", "path").collect()
    return (
        OracleIndex({r["doc_id"]: r["content"] for r in rows}),
        OracleIndex({r["doc_id"]: r["path"] for r in rows}),
    )


def _oracle_multi(oracles, query, weights, type_, k, tie=0.0, mode="or"):
    per_field = []
    for o, w in zip(oracles, weights):
        per_field.append({
            d: s * w for d, s in o.search(query, k=10**9, mode=mode)
        })
    docs = set().union(*[set(d) for d in per_field])
    out = []
    for d in docs:
        ss = [pf[d] for pf in per_field if d in pf]
        if type_ == "most_fields":
            s = sum(ss)
        else:
            s = max(ss) + tie * (sum(ss) - max(ss))
        out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_doc_ids_identical_across_subindexes(engines):
    mf = engines["local"]
    a = mf.engines["content"].doc_meta.select(
        "repo", "path", "commit", "doc_id"
    ).toPandas().set_index(["repo", "path", "commit"])["doc_id"]
    b = mf.engines["path"].doc_meta.select(
        "repo", "path", "commit", "doc_id"
    ).toPandas().set_index(["repo", "path", "commit"])["doc_id"]
    assert a.sort_index().equals(b.sort_index())


@pytest.mark.parametrize("tier", ["local", "dist"])
@pytest.mark.parametrize("type_", ["best_fields", "most_fields"])
def test_multi_match_rank_identity(engines, oracles, tier, type_):
    exp = _oracle_multi(oracles, QUERY, (1.0, 2.0), type_, 10)
    got = engines[tier].multi_match(
        QUERY, {"content": 1.0, "path": 2.0}, k=10, type=type_,
        with_meta=False, as_pandas=True,
    )
    assert list(got["doc_id"]) == [d for d, _ in exp], (tier, type_)
    assert np.allclose(
        got["score"], [s for _, s in exp], rtol=1e-9, atol=0
    ), (tier, type_)


def test_tie_breaker(engines, oracles):
    exp = _oracle_multi(oracles, QUERY, (1.0, 1.0), "best_fields", 10,
                        tie=0.3)
    got = engines["local"].multi_match(
        QUERY, k=10, type="best_fields", tie_breaker=0.3,
        with_meta=False, as_pandas=True,
    )
    assert list(got["doc_id"]) == [d for d, _ in exp]
    assert np.allclose(got["score"], [s for _, s in exp], rtol=1e-9)


def test_per_field_and_operator(engines, oracles):
    """mode='and' requires all terms in the SAME field (ES multi_match
    operator=and); a doc whose terms are split across fields must not
    match."""
    exp = _oracle_multi(oracles, "src common_util", (1.0, 1.0),
                        "best_fields", 10, mode="and")
    got = engines["local"].multi_match(
        "src common_util", k=10, type="best_fields", mode="and",
        with_meta=False, as_pandas=True,
    )
    assert list(got["doc_id"]) == [d for d, _ in exp]


def test_meta_attachment_and_validation(engines):
    mf = engines["local"]
    res = mf.multi_match(QUERY, k=3, as_pandas=True)
    assert {"repo", "path", "sha256"} <= set(res.columns) and len(res) == 3
    with pytest.raises(ValueError, match="type must be"):
        mf.multi_match(QUERY, type="cross_fields")
    with pytest.raises(ValueError, match="unknown fields"):
        mf.multi_match(QUERY, {"nope": 1.0})
    with pytest.raises(ValueError, match="must be > 0"):
        mf.multi_match(QUERY, {"path": 0.0})
    with pytest.raises(ValueError, match="tie_breaker"):
        mf.multi_match(QUERY, tie_breaker=1.5)
    empty = mf.multi_match("zzz_nowhere", k=5, with_meta=False,
                           as_pandas=True)
    assert len(empty) == 0
