"""Incremental / merge semantics vs oracle on post-state (FIXTURES.md §4,
SURVEY.md §5.4): updates, inserts, deletes; deleted docs never surface;
untouched partitions' lineage unchanged; BM25 stays rank-identical (exact
N/avgdl/df corrections)."""

import json

import numpy as np
import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import DOCS_SCHEMA, synth_corpus, synth_rows
from gofias_spark.index.build import build_segment
from gofias_spark.index.merge import apply_delta
from gofias_spark.query.engine import SearchEngine

from .oracle import OracleIndex

N_DOCS = 240
CFG = IndexConfig(n_buckets=4, block_size=16)


@pytest.fixture(scope="module")
def merged_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("incidx"))
    docs = synth_corpus(spark, N_DOCS)
    build_segment(spark, docs, root, CFG)
    seg0_meta_before = json.loads(
        (SearchEngine(spark, root).store.seg_dir(0) / "meta.json").read_text()
    )

    # delta: 2% updated (rev 1 content), a few new rows, a few deletes
    base = synth_rows(N_DOCS)
    updated = [
        r for i, r in enumerate(synth_rows(N_DOCS, rev=1)) if i % 50 == 0
    ]
    new = [
        (f"orgX/new{i}", f"src/new/new_{i}.py", f"c{i}", "py",
         f"def new_function_{i}(shiny_new_term, 1)\ncommon_util helper(x, 2)")
        for i in range(3)
    ]
    # keys disjoint from the updated set (update+delete of the same key in
    # one delta resolves as upsert-wins; tested arithmetic assumes disjoint)
    deleted_keys = [(base[i][0], base[i][1]) for i in range(1, N_DOCS, 97)]
    upserts = spark.createDataFrame(updated + new, schema=DOCS_SCHEMA)
    deletes = spark.createDataFrame(
        deleted_keys, schema="repo string, path string"
    )
    apply_delta(spark, root, upserts=upserts, deletes=deletes, cfg=CFG)
    return root, seg0_meta_before, {
        "updated": updated, "new": new, "deleted": deleted_keys,
    }


@pytest.fixture(scope="module")
def post_oracle(spark, merged_index):
    root, _, _ = merged_index
    engine = SearchEngine(spark, root)
    live = engine.doc_meta
    if engine._tombstones is not None:
        live = live.join(
            engine._tombstones.select("doc_id"), "doc_id", "left_anti"
        )
    rows = live.select("doc_id", "content").collect()
    return OracleIndex({r["doc_id"]: r["content"] for r in rows}), engine


def test_post_state_rank_identity(post_oracle):
    oracle, engine = post_oracle
    for query in [
        "common_util", "shiny_new_term", "index_0", "func search_1",
    ]:
        got = engine.search(query, k=10).collect()
        exp = oracle.search(query, k=10)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], query
        assert np.allclose(
            [r["score"] for r in got], [s for _, s in exp], rtol=1e-9
        ), query


def test_counts_reflect_post_state(post_oracle, merged_index):
    oracle, engine = post_oracle
    _, _, delta = merged_index
    assert engine.count() == oracle.count() == N_DOCS - len(
        delta["deleted"]
    ) + len(delta["new"])
    assert engine.count("common_util") == oracle.count("common_util")


def test_deleted_never_surface(post_oracle, merged_index):
    _, engine = post_oracle
    root, _, delta = merged_index
    repo, path = delta["deleted"][0]
    assert engine.get_doc(repo=repo, path=path).count() == 0
    # deleted docs' ids absent from every search result
    dead = {r["doc_id"] for r in engine._tombstones.collect()}
    hits = engine.search("common_util", k=100).collect()
    assert not ({r["doc_id"] for r in hits} & dead)


def test_updated_doc_new_commit_wins(post_oracle, merged_index):
    _, engine = post_oracle
    _, _, delta = merged_index
    repo, path = delta["updated"][0][0], delta["updated"][0][1]
    rows = engine.get_doc(repo=repo, path=path).collect()
    assert len(rows) == 1
    assert rows[0]["commit"] == delta["updated"][0][2]  # rev-1 commit


def test_untouched_partition_lineage_unchanged(spark, merged_index):
    root, seg0_before, _ = merged_index
    engine = SearchEngine(spark, root)
    seg0_after = json.loads(
        (engine.store.seg_dir(0) / "meta.json").read_text()
    )
    assert seg0_after["partitions"] == seg0_before["partitions"]


def test_delete_by_query_and_reindex(spark, tmp_path_factory):
    """ES _delete_by_query / _reindex analogues: query-resolved deletions
    flow through the normal tombstone MERGE; a reindex from the doc store
    reproduces a standalone equivalent index."""
    import shutil

    from gofias_spark.api import FulltextAPI

    root = str(tmp_path_factory.mktemp("dbqidx"))
    build_segment(spark, synth_corpus(spark, 120), root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    n_before = api.version()["n_docs"]
    n_match = api.count("return switch")
    assert 0 < n_match
    # filtered delete: only the matching py docs go
    n_match_py = api.count("return switch", filters={"lang": "py"})
    assert 0 < n_match_py < n_match
    api.delete_by_query("return switch", filters={"lang": "py"})
    assert api.count("return switch", filters={"lang": "py"}) == 0
    assert api.count("return switch") == n_match - n_match_py
    assert api.version()["n_docs"] == n_before - n_match_py
    # unfiltered delete removes the rest of the matches
    api.delete_by_query("return switch")
    assert api.count("return switch") == 0
    assert api.version()["n_docs"] == n_before - n_match
    # a surviving query still works and excludes deleted docs
    assert api.count("common_util") > 0

    # reindex the post-delete state into a fresh root: identical counts
    # and identical top-k (rank identity across the rebuild)
    dest = str(tmp_path_factory.mktemp("reidx"))
    shutil.rmtree(dest, ignore_errors=True)
    api.reindex(dest)
    r2 = SearchEngine(spark, dest)
    r2.warm()
    assert r2.count("common_util") == api.count("common_util")
    a = [
        (r["repo"], r["path"], round(r["score"], 9))
        for r in api.search_by_term("common_util", size=10).collect()
    ]
    b = [
        (r["repo"], r["path"], round(r["score"], 9))
        for r in r2.search("common_util", k=10).collect()
    ]
    assert a == b
    api.close()
    r2.close()


def test_update_by_query(spark, tmp_path_factory):
    """ES _update_by_query analogue: matched docs are transformed and
    MERGEd back through the upsert path — retokenized, old versions
    tombstoned, doc count unchanged."""
    from pyspark.sql import functions as F

    from gofias_spark.api import FulltextAPI

    root = str(tmp_path_factory.mktemp("ubqidx"))
    build_segment(spark, synth_corpus(spark, 80), root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    n_before = api.version()["n_docs"]
    n_match = api.count("common_util")
    assert n_match > 0
    assert api.count("upqtagged") == 0

    api.update_by_query(
        "common_util",
        {"content": F.concat(F.col("content"), F.lit(" upqtagged")),
         "lang": "'zz'"},
    )
    # every previously-matching doc now carries the tag and the new lang
    assert api.count("upqtagged") == n_match
    assert api.count("upqtagged", filters={"lang": "zz"}) == n_match
    # the original term still matches (content was appended, not replaced)
    assert api.count("common_util") == n_match
    # doc count unchanged: updates, not inserts
    assert api.version()["n_docs"] == n_before

    # identity keys are immutable
    import pytest as _pytest
    with _pytest.raises(ValueError):
        api.update_by_query("common_util", {"path": "'x'"})
