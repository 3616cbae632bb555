"""Index integrity checker: a healthy index passes every check; seeded
corruption (missing partition dir, doctored lineage, tampered content) is
detected and named."""

import json
import shutil

import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.index.fsck import check_index
from gofias_spark.index.merge import apply_delta


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fsckidx"))
    build_segment(
        spark, synth_corpus(spark, 120), root,
        IndexConfig(n_buckets=4, block_size=16),
    )
    # exercise the delta/tombstone checks too
    deletes = spark.createDataFrame(
        [("org0/project0", "src/index/search_0.py")], "repo string, path string"
    )
    apply_delta(spark, root, deletes=deletes)
    return root


def test_healthy_index_passes(spark, idx):
    report = check_index(spark, idx)
    assert report["ok"], report["errors"]
    assert report["checks"]["sha256_sampled"] > 0
    assert report["checks"]["terms_sampled"] > 0
    assert report["checks"]["live_docs"] > 0


def test_corruptions_detected(spark, idx, tmp_path):
    snap = str(tmp_path / "corrupt")
    shutil.copytree(idx, snap)
    # 1) remove a committed postings partition dir
    from gofias_spark.index.store import IndexStore

    store = IndexStore(snap)
    meta = json.loads((store.seg_dir(0) / "meta.json").read_text())
    victim = next(
        p["part"] for p in meta["partitions"] if p.get("rows", 0) > 0
    )
    shutil.rmtree(store.seg_dir(0) / "postings" / f"doc_part={victim}")
    # 2) doctor the lineage doc count
    meta["partitions"][0]["n_docs"] += 5
    (store.seg_dir(0) / "meta.json").write_text(json.dumps(meta))
    report = check_index(spark, snap)
    assert not report["ok"]
    text = " ".join(report["errors"])
    assert "partition dir missing" in text
    assert "lineage n_docs" in text


def test_all_postings_dirs_missing_reports_not_crashes(spark, idx, tmp_path):
    """Every segment's postings/ gone but term_stats intact: fsck must
    return ok=False with errors, not AttributeError on the None union."""
    import shutil as _sh

    from gofias_spark.index.store import IndexStore

    snap = str(tmp_path / "nopostings")
    _sh.copytree(idx, snap)
    store = IndexStore(snap)
    for s in store.read_manifest()["segments"]:
        pdir = store.seg_dir(s) / "postings"
        if pdir.exists():
            _sh.rmtree(pdir)
    report = check_index(spark, snap)
    assert not report["ok"]
    assert report["errors"]
