"""Segment compaction — SURVEY.md §2.1 S9.

The reference calls refresh + flush + forcemerge + clear-cache after bulk
phases (/root/reference/app/infrastructure/persistence/elastic/
client.go:102-108, invoked from elasticAddressRepository.go:735-766). The
engine analogue (and the Iceberg ``rewrite_data_files`` analogue): rewrite
all live docs into one fresh segment, dropping tombstones, stats deltas and
superseded segments. Query results are unchanged (tested); doc_ids are
freshly assigned (they are internal, like Lucene docIDs across merges).
"""

from __future__ import annotations

import shutil

from pyspark.sql import SparkSession

from gofias_spark.config import AnalyzerConfig, IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.index.store import IndexStore


def compact(
    spark: SparkSession, index_root: str, cfg: IndexConfig | None = None
) -> dict:
    """Force-merge the index into a single live segment."""
    store = IndexStore(index_root)
    manifest = store.read_manifest()
    cfg = cfg or IndexConfig(
        n_buckets=manifest["config"]["n_buckets"],
        block_size=manifest["config"]["block_size"],
        analyzer=AnalyzerConfig(**manifest["config"]["analyzer"]),
        positions=manifest["config"].get("positions", False),
    )
    old_segments = list(manifest["segments"])
    tomb_files = list(manifest["tombstones"]["files"])

    live = None
    for s in old_segments:
        df = spark.read.parquet(str(store.seg_dir(s) / "doc_meta"))
        live = df if live is None else live.unionByName(df)
    if tomb_files:
        tombs = spark.read.parquet(
            *[str(store.root / f) for f in tomb_files]
        )
        live = live.join(tombs.select("doc_id"), "doc_id", "left_anti")
    docs = live.select("repo", "path", "commit", "lang", "content")

    new_seg = manifest["next_seg_id"]
    build_segment(spark, docs, index_root, cfg, seg_id=new_seg)

    manifest = store.read_manifest()
    manifest["segments"] = [new_seg]
    manifest["tombstones"] = {"n_docs": 0, "sum_dl": 0, "files": []}
    store.write_manifest(manifest)

    # physical cleanup of superseded data (after the manifest commit, so a
    # crash mid-cleanup leaves a correct index with orphan files at worst)
    for s in old_segments:
        if s != new_seg:
            shutil.rmtree(store.seg_dir(s), ignore_errors=True)
    for f in tomb_files:
        shutil.rmtree(store.root / f, ignore_errors=True)
    sd = store.root / "stats_delta"
    if sd.exists():
        shutil.rmtree(sd, ignore_errors=True)
    return manifest
