"""Process-wide driver-cache byte budget (r3 verdict #7): several warmed
engines on one driver must respect a SHARED byte cap — LRU peers are
evicted (degrading to cold routing, same results), and an engine whose
caches alone exceed the cap is refused admission outright."""

import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine
from gofias_spark.query.memgov import CacheGovernor, GOVERNOR, set_cache_budget

CFG = IndexConfig(n_buckets=3, block_size=16)


@pytest.fixture()
def unlimited_budget():
    yield
    set_cache_budget(None)


def _mk_engine(spark, tmp_path_factory, name, n_docs=60):
    root = str(tmp_path_factory.mktemp(name))
    build_segment(spark, synth_corpus(spark, n_docs), root, CFG)
    return SearchEngine(spark, root)


def test_unit_lru_and_admission():
    gov = CacheGovernor(budget_bytes=100)
    dropped = []
    assert gov.admit("a", 60, lambda: dropped.append("a"))
    assert gov.admit("b", 50, lambda: dropped.append("b"))
    # a was LRU -> evicted to fit b
    assert dropped == ["a"] and gov.keys() == ["b"]
    assert gov.total_bytes() == 50
    # touching keeps an entry alive: c evicts the un-touched... re-add a
    assert gov.admit("a", 40, lambda: dropped.append("a"))
    gov.touch("b")
    assert gov.admit("c", 50, lambda: dropped.append("c"))
    assert dropped == ["a", "a"] and set(gov.keys()) == {"b", "c"}
    # an entry bigger than the whole budget is refused, nothing evicted
    assert not gov.admit("huge", 101, lambda: dropped.append("huge"))
    assert set(gov.keys()) == {"b", "c"}
    # shrinking the budget evicts immediately (both 50-byte entries
    # exceed 49 together AND individually -> all go)
    gov.set_budget(49)
    assert gov.keys() == [] and gov.total_bytes() == 0
    gov.set_budget(None)


def test_two_engines_share_byte_cap(spark, tmp_path_factory,
                                    unlimited_budget):
    a = _mk_engine(spark, tmp_path_factory, "gova")
    b = _mk_engine(spark, tmp_path_factory, "govb")
    try:
        a.warm()
        assert a._local_blocks is not None
        a_bytes = a._resident_cache_bytes()
        assert a_bytes > 0
        # cap fits ONE warmed engine, not two -> warming b evicts a
        set_cache_budget(int(a_bytes * 1.5))
        b.warm()
        assert b._local_blocks is not None
        assert a._local_blocks is None and a._stats_cache is None
        assert GOVERNOR.total_bytes() <= int(a_bytes * 1.5)
        # both engines still answer correctly (a on cold routing)
        ra = a.search("common_util", k=3).collect()
        rb = b.search("common_util", k=3).collect()
        assert len(ra) == 3 and len(rb) == 3
        assert [r["doc_id"] for r in ra] == [r["doc_id"] for r in rb]
    finally:
        a.close()
        b.close()


def test_admission_refused_when_cap_tiny(spark, tmp_path_factory,
                                         unlimited_budget):
    set_cache_budget(1024)  # smaller than any warmed engine's caches
    eng = _mk_engine(spark, tmp_path_factory, "govc")
    try:
        eng.warm()
        assert eng._local_blocks is None  # dropped on refusal
        assert GOVERNOR.total_bytes() <= 1024
        rows = eng.search("common_util", k=3).collect()
        assert len(rows) == 3
    finally:
        eng.close()


def test_fuzzy_map_reaccounted_and_droppable(spark, tmp_path_factory,
                                             unlimited_budget):
    """The lazily built fuzzy deletion map (a MULTIPLE of the stats
    dict's bytes) must be re-admitted to the governor when materialized
    (r4 advice): its bytes show up in the accounting, and under a budget
    that fits warm() but not warm()+map, the map alone is dropped —
    fuzzy queries fall back to the Spark join path with identical
    results."""
    eng = _mk_engine(spark, tmp_path_factory, "govf")
    try:
        eng.warm()
        warm_bytes = eng._resident_cache_bytes()
        assert warm_bytes > 0
        assert eng._fuzzy_map is None
        # materialize the map: accounting grows and the governor sees it
        assert eng._fuzzy_deletion_map() is not None
        full_bytes = eng._resident_cache_bytes()
        assert full_bytes > warm_bytes
        assert GOVERNOR._entries[eng._gov_key][0] == full_bytes
        fuzzy_with_map = eng.search_fuzzy("commom_util", k=5,
                                          as_pandas=True)
        # back to the warm-only entry, then a budget that fits the warm
        # caches but NOT the enlarged entry: the next map (re)build is
        # refused, map dropped, smaller entry kept
        eng._fuzzy_map = None
        eng._fuzzy_map_token = None
        eng.warm()
        warm_bytes2 = eng._resident_cache_bytes()
        set_cache_budget(warm_bytes2 + (full_bytes - warm_bytes) // 2)
        assert eng._fuzzy_deletion_map() is None
        assert eng._fuzzy_map is None
        assert eng._stats_cache is not None  # smaller entry re-admitted
        assert GOVERNOR.total_bytes() <= GOVERNOR.budget_bytes
        # refusal is memoized per index state: no rebuild-to-fail loop
        assert eng._fuzzy_map_refused_token is not None
        assert eng._fuzzy_deletion_map() is None
        # join-path fuzzy returns the same rows as the map path
        fuzzy_cold = eng.search_fuzzy("commom_util", k=5, as_pandas=True)
        assert list(fuzzy_cold["doc_id"]) == list(fuzzy_with_map["doc_id"])
    finally:
        eng.close()


def test_close_releases_accounting(spark, tmp_path_factory,
                                   unlimited_budget):
    eng = _mk_engine(spark, tmp_path_factory, "govd")
    eng.warm()
    key = eng._gov_key
    assert key in GOVERNOR.keys()
    eng.close()
    assert key not in GOVERNOR.keys()
