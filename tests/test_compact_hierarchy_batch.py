"""Compaction (S9), hierarchy rollup (J1), batched multi-query search (J4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import DOCS_SCHEMA, synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.index.compact import compact
from gofias_spark.index.merge import apply_delta
from gofias_spark.index.store import IndexStore
from gofias_spark.operators.hierarchy import enrich_hierarchy
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=4, block_size=16)


def test_compact_preserves_results(spark, tmp_path):
    root = str(tmp_path / "cidx")
    docs = synth_corpus(spark, 150)
    build_segment(spark, docs, root, CFG)
    ups = spark.createDataFrame(
        [("orgN/new", "src/n.py", "c1", "py", "fresh compaction_probe doc")],
        schema=DOCS_SCHEMA,
    )
    dels = spark.createDataFrame(
        [("org0/project0", "src/index/index_0.py")],
        schema="repo string, path string",
    )
    apply_delta(spark, root, upserts=ups, deletes=dels, cfg=CFG)

    eng_before = SearchEngine(spark, root)
    queries = ["common_util", "compaction_probe", "func index_1"]
    before = {
        q: [
            (r["repo"], r["path"], round(r["score"], 9))
            for r in eng_before.search(q, k=10).collect()
        ]
        for q in queries
    }
    n_before = eng_before.count()

    compact(spark, root)
    store = IndexStore(root)
    manifest = store.read_manifest()
    assert len(manifest["segments"]) == 1
    assert manifest["tombstones"]["files"] == []
    eng = SearchEngine(spark, root)
    assert eng.count() == n_before
    for q in queries:
        after = [
            (r["repo"], r["path"], round(r["score"], 9))
            for r in eng.search(q, k=10).collect()
        ]
        assert after == before[q], q


def test_hierarchy_rollup(spark):
    # region -> area -> city -> street (the reference's level semantics)
    rows = [
        (1, None, "Moscow Region", 1),
        (2, None, "Tver Region", 1),
        (10, 1, "Podolsk Area", 2),
        (20, 1, "Moscow", 3),        # level-skip: parent is level 1
        (21, 10, "Podolsk", 3),
        (30, 21, "Lenina St", 4),
        (31, 20, "Tverskaya St", 4),
        (32, None, "Orphan St", 4),
    ]
    nodes = spark.createDataFrame(
        rows, "id long, parent_id long, name string, level int"
    )
    got = {
        r["id"]: r["full_path"]
        for r in enrich_hierarchy(nodes).collect()
    }
    assert got[30] == "Moscow Region, Podolsk Area, Podolsk, Lenina St"
    assert got[31] == "Moscow Region, Moscow, Tverskaya St"
    assert got[32] == "Orphan St"
    assert got[1] == "Moscow Region"


@pytest.fixture(scope="module")
def batch_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("batchidx"))
    build_segment(spark, synth_corpus(spark, 300), root, CFG)
    return SearchEngine(spark, root)


@pytest.mark.parametrize("mode", ["and", "or"])
def test_search_many_matches_single(batch_engine, mode):
    queries = {
        "q1": "common_util",
        "q2": "func index_1",
        "q3": "zzz_nope",
        "q4": "search_2 batch_3",
    }
    batched = batch_engine.search_many(queries, k=5, mode=mode).collect()
    by_q: dict = {}
    for r in batched:
        by_q.setdefault(r["query"], []).append(r)
    for qid, text in queries.items():
        single = batch_engine.search(
            text, k=5, mode=mode, with_meta=False
        ).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], (
            f"{qid} mode={mode}"
        )
        if single:
            assert np.allclose(
                [r["score"] for r in got],
                [r["score"] for r in single],
                rtol=1e-9,
            )


def test_search_many_with_filters(batch_engine):
    out = batch_engine.search_many(
        {"a": "common_util"}, k=5, filters={"lang": "py"}
    ).collect()
    single = batch_engine.search(
        "common_util", k=5, filters={"lang": "py"}, with_meta=False
    ).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        r["doc_id"] for r in single
    ]


def test_compact_invalidates_and_rebuilds_serve_cache(spark, tmp_path):
    """The serve cache token fingerprints segment state: compaction must
    rotate it (stale postings never served) and the rebuilt cache must be
    result-identical."""
    root = str(tmp_path / "csidx")
    build_segment(spark, synth_corpus(spark, 120), root, CFG)
    ups = spark.createDataFrame(
        [("orgN/new", "src/n.py", "c1", "py", "fresh compaction_probe doc")],
        schema=DOCS_SCHEMA,
    )
    apply_delta(spark, root, upserts=ups, cfg=CFG)
    e1 = SearchEngine(spark, root)
    e1.warm(local_max_blocks=0)
    assert e1._serve is not None
    path1 = e1._serve.path
    before = [
        (r["repo"], r["path"], round(r["score"], 9))
        for r in e1.search("common_util", k=10).collect()
    ]
    e1.close()
    compact(spark, root)
    e2 = SearchEngine(spark, root)
    e2.warm(local_max_blocks=0)
    assert e2._serve is not None and e2._serve.path != path1
    after = [
        (r["repo"], r["path"], round(r["score"], 9))
        for r in e2.search("common_util", k=10).collect()
    ]
    assert after == before and len(after) > 0
