"""Plan-quality regression tests (SURVEY.md §4.3): filters push to the
parquet scans, projections prune columns, small sides broadcast, top-k is
TakeOrderedAndProject — the properties the 100 TB design depends on."""

import pytest
from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.plans import checks as C
from gofias_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("planidx"))
    build_segment(
        spark, synth_corpus(spark, 200), root,
        IndexConfig(n_buckets=4, block_size=32),
    )
    return SearchEngine(spark, root, cache=False)


def test_term_filter_pushed_to_postings_scan(engine):
    """The per-query postings scan must push `term IN (...)` into parquet
    (files are sorted by term -> row-group min/max pruning applies)."""
    df = engine.postings.filter(F.col("term").isin(["common_util", "func"]))
    assert C.has_pushed_filter(df, "term")


def test_postings_scan_prunes_columns(engine):
    df = engine.postings.filter(F.col("term") == "func").select(
        "term", "docs", "base"
    )
    cols = C.scan_read_schema(df)
    assert "docs" in cols and "term" in cols
    assert "tfs" not in cols and "dls" not in cols


def test_doc_meta_filter_pushdown(engine):
    """Attribute filters (F7 analogue) must reach the doc_meta scan —
    at scale this is the difference between reading one partition and all."""
    df = engine.doc_meta.filter(F.col("lang") == "go").select("doc_id")
    assert C.has_pushed_filter(df, "lang")
    assert "content" not in C.scan_read_schema(df)


def test_search_meta_join_is_broadcast(engine):
    plan_df = engine.search("common_util", k=5)
    assert C.uses_broadcast_join(plan_df)


def test_topk_is_take_ordered(engine):
    scored = engine.search("common_util", k=5, with_meta=False)
    assert C.uses_take_ordered(scored)
