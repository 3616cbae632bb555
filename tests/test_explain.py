"""explain_query: the routing introspection surface mirrors search()'s
actual three-tier dispatch."""

import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=3, block_size=16)


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    r = str(tmp_path_factory.mktemp("explidx"))
    build_segment(spark, synth_corpus(spark, 120), r, CFG)
    return r


def test_local_route(spark, root):
    eng = SearchEngine(spark, root)
    eng.warm()  # small index -> driver-resident
    ex = eng.explain_query("func")
    assert ex["route"] == "local"
    assert ex["terms"]["func"] > 0
    assert ex["posting_volume"] == ex["terms"]["func"]


def test_serve_route_and_budget(spark, root):
    eng = SearchEngine(spark, root)
    eng.warm(local_max_blocks=0)
    ex = eng.explain_query("func")
    assert ex["route"] == "serve"
    assert ex["serve_budget"] > 0
    # filters ride the serve tier too (sidecar carries the fields)
    exf = eng.explain_query("func", filters={"doclen": {"gte": 1}})
    assert exf["route"] == "serve"


def test_distributed_route_reasons(spark, root):
    eng = SearchEngine(spark, root, serve=False)
    eng.warm(local_max_blocks=0)
    ex = eng.explain_query("func")
    assert ex["route"] == "distributed"
    assert ex["reason"] == "no serve cache"

    tiny = SearchEngine(spark, root, serve_max_postings=1)
    tiny.warm(local_max_blocks=0)
    ex2 = tiny.explain_query("func")
    assert ex2["route"] == "distributed"
    assert "excluded hot term" in ex2["reason"] or "over serve budget" in (
        ex2["reason"]
    )


def test_empty_routes(spark, root):
    eng = SearchEngine(spark, root)
    eng.warm()
    assert eng.explain_query("zzzznotaterm func")["reason"] == (
        "AND term absent"
    )
    assert eng.explain_query("...")["reason"] == "no terms"
    assert eng.explain_query("func", filters={"lang": []})["reason"] == (
        "impossible filter"
    )
    assert eng.explain_query("zzzznotaterm", mode="or")["reason"] == (
        "no indexed terms"
    )
    or_ex = eng.explain_query("zzzznotaterm func", mode="or")
    assert or_ex["route"] == "local"
    assert or_ex["posting_volume"] == or_ex["terms"]["func"]


def test_must_not_in_explain(spark, root):
    eng = SearchEngine(spark, root)
    eng.warm()
    ex = eng.explain_query("func", must_not="return")
    assert ex["route"] == "local"
    assert ex["neg_terms"]["return"] > 0
    # negated postings count toward the routed volume (they ride the scan)
    assert ex["posting_volume"] == (
        ex["terms"]["func"] + ex["neg_terms"]["return"]
    )
    assert eng.explain_query("func", must_not="func")["reason"] == (
        "required term also negated"
    )
    # an unindexed negated term adds nothing
    noneg = eng.explain_query("func", must_not="zzzznotaterm")
    assert "neg_terms" not in noneg
    assert noneg["posting_volume"] == noneg["terms"]["func"]


def test_explain_doc_matches_search_score(spark, root):
    """ES _explain analogue: the per-term breakdown's total equals the
    kernel's BM25 score for the same (query, doc) to float precision,
    and termvectors' tf agrees with the breakdown."""
    eng = SearchEngine(spark, root)
    eng.warm()
    hits = eng.search("func return", k=3).collect()
    assert hits
    for h in hits:
        ex = eng.explain_doc("func return", h["doc_id"])
        assert ex["matches"] is True
        assert abs(ex["score"] - h["score"]) < 1e-9
        tv = eng.termvectors(h["doc_id"])
        tfmap = dict(zip(tv["term"], tv["tf"]))
        for t, d in ex["terms"].items():
            assert tfmap.get(t, 0) == d["tf"]
    miss = eng.explain_doc("func zzznotaterm", hits[0]["doc_id"])
    assert miss["matches"] is False and miss["score"] == 0.0
    assert miss["terms"]["zzznotaterm"]["contribution"] == 0.0
    gone = eng.explain_doc("func", 10**15)
    assert gone["matches"] is False and gone["reason"] == "doc not found"
    assert len(eng.termvectors(10**15)) == 0


def test_route_matches_actual_dispatch(spark, root):
    """The explain is honest: take the route it names and confirm search()
    used that machinery (serve tier -> zero Spark jobs)."""
    eng = SearchEngine(spark, root)
    eng.warm(local_max_blocks=0)
    assert eng.explain_query("func")["route"] == "serve"
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    eng.search("func", k=5, as_pandas=True)
    assert tracker.getJobIdsForGroup(None) == before
