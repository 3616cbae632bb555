"""Resume-from-checkpoint (SURVEY.md §5.5, FIXTURES.md §5): a build killed
after N committed partitions resumes from the manifest, does not recompute
committed partitions, and the final index equals an uninterrupted build."""

import os

import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.index.store import IndexStore
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=5, block_size=16)
N_DOCS = 240  # -> 5 doc_parts


def _postings_content(spark, root):
    eng = SearchEngine(spark, root, cache=False)
    rows = eng.postings.drop("seg").collect()
    return sorted(
        (r["term"], r["doc_part"], r["block_id"], r["n"], r["base"],
         r["last"], bytes(r["docs"]), bytes(r["tfs"]), bytes(r["dls"]))
        for r in rows
    )


def test_kill_resume_identical(spark, tmp_path):
    docs = synth_corpus(spark, N_DOCS)

    interrupted = str(tmp_path / "interrupted")
    with pytest.raises(RuntimeError, match="fault injection"):
        build_segment(spark, docs, interrupted, CFG, _fail_after_parts=2)

    store = IndexStore(interrupted)
    committed = store.committed_parts(0)
    assert len(committed) == 2

    # record committed partition files: resume must not rewrite them
    def part_sig(part):
        d = store.seg_dir(0) / "postings" / f"doc_part={part}"
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in sorted(os.listdir(d))
        }

    sigs_before = {p: part_sig(p) for p in committed}

    build_segment(spark, docs, interrupted, CFG)  # resume
    assert len(store.committed_parts(0)) == 5

    for p in committed:
        assert part_sig(p) == sigs_before[p], (
            f"committed partition {p} was rebuilt on resume"
        )

    clean = str(tmp_path / "clean")
    build_segment(spark, docs, clean, CFG)
    assert _postings_content(spark, interrupted) == _postings_content(
        spark, clean
    )

    # resumed index answers queries
    eng = SearchEngine(spark, interrupted)
    assert eng.count("common_util") == N_DOCS // 2
