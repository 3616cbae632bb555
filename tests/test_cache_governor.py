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


def test_close_releases_accounting(spark, tmp_path_factory,
                                   unlimited_budget):
    eng = _mk_engine(spark, tmp_path_factory, "govd")
    eng.warm()
    key = eng._gov_key
    assert key in GOVERNOR.keys()
    eng.close()
    assert key not in GOVERNOR.keys()
