"""API facade (S11/J5 analogues) + Structured-Streaming delta ingestion
(ST1-ST3 via stream_deltas) end-to-end."""

import os

from pyspark.sql import functions as F

from gofias_spark.api import FulltextAPI
from gofias_spark.config import AnalyzerConfig, IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=3, block_size=16)
PREFIX_CFG = IndexConfig(
    n_buckets=3,
    block_size=16,
    analyzer=AnalyzerConfig(mode="edge_ngram", min_gram=1, max_gram=40),
)


def test_api_suggest_backfill_and_list(spark, tmp_path):
    docs = synth_corpus(spark, 120)
    std_root = str(tmp_path / "std")
    pfx_root = str(tmp_path / "pfx")
    build_segment(spark, docs, std_root, CFG)
    build_segment(spark, docs, pfx_root, PREFIX_CFG)
    api = FulltextAPI(spark, std_root, prefix_index_root=pfx_root)

    # exact term: primary hits suffice
    full = api.suggest("common_util", size=5).collect()
    assert len(full) == 5

    # pure prefix: no exact hits, backfill fills from the edge-ngram index
    pref = api.suggest("common_ut", size=5).collect()
    assert len(pref) == 5
    assert len({r["doc_id"] for r in pref}) == 5

    # the two suggest modes agree row-for-row: the DataFrame path's
    # backfill is score-ordered (top-scored prefix hits), not an
    # arbitrary partition-order limit() (r3 review)
    pdf = api.suggest("common_ut", size=5, as_pandas=True)
    assert [r["doc_id"] for r in pref] == pdf["doc_id"].tolist()

    # paging surface
    page = api.search_by_term("common_util", size=3, from_=2).collect()
    assert [r["doc_id"] for r in page] == [
        r["doc_id"] for r in api.search_by_term("common_util", size=5).collect()
    ][2:5]

    # unscored filtered scan with cap + stable order
    listed = api.list_by_filters({"lang": "py"}, limit=7).collect()
    assert 0 < len(listed) <= 7
    assert all(r["lang"] == "py" for r in listed)
    assert api.count("common_util") == 60
    assert api.version()["n_docs"] == 120


def test_stream_deltas_merges_microbatches(spark, tmp_path):
    from gofias_spark.streaming.incremental import stream_deltas

    docs = synth_corpus(spark, 60)
    root = str(tmp_path / "idx")
    build_segment(spark, docs, root, CFG)
    n0 = SearchEngine(spark, root, cache=False).stats()["n_docs"]

    delta_dir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(delta_dir, exist_ok=True)
    # delta file 1: two new docs
    spark.createDataFrame(
        [
            ("orgX/p", "src/new_a.py", "c1", "py", "streaming upsert alpha"),
            ("orgX/p", "src/new_b.py", "c1", "py", "streaming upsert beta"),
        ],
        "repo string, path string, commit string, lang string, content string",
    ).coalesce(1).write.mode("append").parquet(delta_dir)
    # delta file 2: delete one existing doc (null content = delete)
    victim = docs.limit(1).collect()[0]
    spark.createDataFrame(
        [(victim["repo"], victim["path"], victim["commit"], victim["lang"], None)],
        "repo string, path string, commit string, lang string, content string",
    ).coalesce(1).write.mode("append").parquet(delta_dir)

    q = stream_deltas(spark, root, delta_dir, ckpt, cfg=CFG)
    q.awaitTermination()

    eng = SearchEngine(spark, root, cache=False)
    assert eng.stats()["n_docs"] == n0 + 2 - 1
    assert eng.count("streaming") == 2
    assert (
        eng.get_doc(
            repo=victim["repo"], path=victim["path"], commit=victim["commit"]
        ).count()
        == 0
    )
