"""Snapshots (ES snapshot / Iceberg-snapshot analogue) and aliases.

A snapshot must be a true point-in-time capture: restorable to an
independent index that returns the EXACT pre-snapshot results even after
the source index is delta-mutated AND compacted (compaction physically
deletes superseded segment dirs — the snapshot's hardlinks must keep the
bytes alive). Aliases are an atomic pointer swap for zero-downtime rebuild.
"""

import json

import pytest
from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.aliases import AliasRegistry
from gofias_spark.index.build import build_segment
from gofias_spark.index.compact import compact
from gofias_spark.index.merge import apply_delta
from gofias_spark.index.store import IndexStore
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=3, block_size=16)
Q = "common_util helper"


def _hits(spark, root, q=Q, k=10):
    eng = SearchEngine(spark, root)
    eng.warm()
    pdf = eng.search(q, k=k, as_pandas=True)
    return list(zip(pdf["doc_id"], pdf["score"], pdf["sha256"]))


@pytest.fixture(scope="module")
def roots(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("snapidx")
    root = str(base / "idx")
    build_segment(spark, synth_corpus(spark, 200), root, CFG)
    return base, root


def test_snapshot_survives_delta_and_compact(spark, roots):
    base, root = roots
    store = IndexStore(root)
    before = _hits(spark, root)
    info = store.snapshot("s1")
    assert info["n_files"] > 0 and info["bytes"] > 0

    # mutate: delete the top hit + upsert new docs, then force-merge —
    # compaction rmtree's the old segment dir the snapshot points into
    eng = SearchEngine(spark, root)
    victim = eng.get_doc(int(before[0][0])).collect()[0]
    dels = spark.createDataFrame(
        [(victim["repo"], victim["path"])], "repo string, path string"
    )
    ups = synth_corpus(spark, 10, seed=99)
    apply_delta(spark, root, upserts=ups, deletes=dels)
    compact(spark, root)
    after = _hits(spark, root)
    assert after != before  # the mutation is visible live

    # restore -> an independent index with the EXACT pre-mutation results
    restored = str(base / "restored")
    IndexStore(root).restore_snapshot("s1", restored)
    assert _hits(spark, restored) == before


def test_snapshot_after_delta_pins_tombstones(spark, roots, tmp_path):
    """A snapshot taken AFTER a delta must pin tombstones + stats_delta:
    the restored index masks the deleted doc exactly like the source did."""
    base, root = roots
    store = IndexStore(root)
    # the module ran compact in the test above; make a fresh delta state
    eng = SearchEngine(spark, root)
    row = eng.doc_meta.limit(1).collect()[0]
    dels = spark.createDataFrame(
        [(row["repo"], row["path"])], "repo string, path string"
    )
    apply_delta(spark, root, deletes=dels)
    now = _hits(spark, root)
    store.snapshot("post-delta")
    restored = str(tmp_path / "restored2")
    store.restore_snapshot("post-delta", restored)
    assert _hits(spark, restored) == now
    r_eng = SearchEngine(spark, restored)
    assert r_eng.get_doc(int(row["doc_id"])).collect() == []


def test_snapshot_descriptor_and_errors(spark, roots, tmp_path):
    base, root = roots
    store = IndexStore(root)
    names = [s["name"] for s in store.list_snapshots()]
    assert "s1" in names and "post-delta" in names
    assert store.read_snapshot("s1")["manifest"]["segments"]

    with pytest.raises(ValueError, match="already exists"):
        store.snapshot("s1")
    with pytest.raises(ValueError, match="bad snapshot name"):
        store.snapshot("../evil")
    with pytest.raises(ValueError, match="no snapshot"):
        store.read_snapshot("nope")
    with pytest.raises(ValueError, match="no snapshot"):
        store.delete_snapshot("nope")
    with pytest.raises(ValueError, match="index already exists"):
        store.restore_snapshot("s1", root)

    store.snapshot("tmp")
    store.delete_snapshot("tmp")
    assert "tmp" not in [s["name"] for s in store.list_snapshots()]


def test_restored_index_is_independent(spark, roots, tmp_path):
    """Mutating the restored index must not affect the source (hardlinked
    files are immutable; mutations only add/unlink)."""
    base, root = roots
    store = IndexStore(root)
    src_before = _hits(spark, root)
    restored = str(tmp_path / "indep")
    store.restore_snapshot("post-delta", restored)
    r_eng = SearchEngine(spark, restored)
    row = r_eng.doc_meta.orderBy(F.desc("doc_id")).limit(1).collect()[0]
    dels = spark.createDataFrame(
        [(row["repo"], row["path"])], "repo string, path string"
    )
    apply_delta(spark, restored, deletes=dels)
    compact(spark, restored)
    assert _hits(spark, root) == src_before


def test_alias_registry(spark, roots, tmp_path):
    base, root = roots
    reg = AliasRegistry(tmp_path / "aliases.json")
    assert reg.resolve("whatever/path") == "whatever/path"  # passthrough
    reg.set("live", root)
    assert reg.resolve("live") == str(root)
    # the engine opens via the resolved alias
    eng = SearchEngine(spark, reg.resolve("live"))
    assert eng.manifest["segments"]

    restored = str(base / "restored")  # from the first test
    reg.swap("live", restored)
    assert reg.resolve("live") == restored
    assert json.loads((tmp_path / "aliases.json").read_text()) == {
        "live": restored
    }
    with pytest.raises(ValueError, match="no index manifest"):
        reg.set("bad", tmp_path / "not_an_index")
    with pytest.raises(ValueError, match="bad alias"):
        reg.set("a/b", root)
    reg.remove("live")
    with pytest.raises(ValueError, match="no alias"):
        reg.remove("live")
    assert reg.list() == {}
