"""Incremental MERGE: insert / update / delete over a built index.

Mirrors the reference's delta-import semantics (SURVEY.md §2.9):
  * active routing — updated rows are (re)indexed, deleted rows removed
    (elasticAddressRepository.go:662-671 routes active->index action,
    inactive->delete action);
  * upsert copy-forward — non-empty fields of the existing doc survive a
    partial update (jsonAddressDto.go:108-175 copies location/hierarchy
    fields forward; here: ``coalesce(new.lang, old.lang)``);
  * version bookkeeping — the manifest records each delta application
    (versionRepository.go:102-119 persists counts per import).

Physical design (Lucene-style segments, Iceberg-MERGE-equivalent):
  * upserts build a NEW segment (doc_ids are unique by construction:
    the segment id is part of the doc_id bit layout);
  * replaced/deleted docs become TOMBSTONES (doc_id + analyzed dl), masked at
    query time and subtracted from N / sum_dl;
  * per-term df corrections go to ``stats_delta`` (term, ddf), computed by
    re-tokenizing exactly the removed docs' stored content — an incremental,
    exact stats refresh with cost proportional to the delta, not the corpus.

Logical doc key = (repo, path): a new commit for a key supersedes the old
row; a delete removes the key (FIXTURES.md §4).
"""

from __future__ import annotations

import time
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofias_spark.analyzer import tokenize_series
from gofias_spark.config import AnalyzerConfig, IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.index.store import IndexStore

LOGICAL_KEY = ["repo", "path"]


def _removed_term_dfs(analyzer: AnalyzerConfig):
    """mapInPandas: removed docs' content -> (term, ddf) partials.
    Distinct terms per doc, counted — exactly reverses each doc's
    contribution to per-term df."""

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = tokenize_series(pdf["content"], analyzer)
            terms = toks.map(lambda ts: list(set(ts)))
            long = pd.DataFrame(
                {"term": [t for ts in terms for t in ts]}
            )
            if len(long) == 0:
                continue
            out = long.groupby("term").size().rename("ddf").reset_index()
            yield out

    return fn


def _removed_doc_dls(analyzer: AnalyzerConfig):
    """mapInPandas: removed docs -> (doc_id, dl) with the EXACT analyzed
    token count (must mirror the dl stored in postings, or post-merge
    avgdl — and therefore BM25 — would drift from the oracle)."""

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dl = tokenize_series(pdf["content"], analyzer).map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "dl": dl.astype("int64"),
                }
            )

    return fn


def apply_delta(
    spark: SparkSession,
    index_root: str,
    upserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    cfg: IndexConfig | None = None,
) -> dict:
    """Apply a delta (upserts: docs-schema rows; deletes: (repo, path) rows).
    Returns the updated manifest."""
    store = IndexStore(index_root)
    manifest = store.read_manifest()
    cfg = cfg or IndexConfig(
        n_buckets=manifest["config"]["n_buckets"],
        block_size=manifest["config"]["block_size"],
        analyzer=AnalyzerConfig(**manifest["config"]["analyzer"]),
        positions=manifest["config"].get("positions", False),
    )
    analyzer = cfg.analyzer

    # current live doc_meta across segments
    metas = [
        spark.read.parquet(str(store.seg_dir(s) / "doc_meta"))
        for s in manifest["segments"]
    ]
    doc_meta = metas[0]
    for m in metas[1:]:
        doc_meta = doc_meta.unionByName(m)
    tomb_files = manifest["tombstones"]["files"]
    if tomb_files:
        old_tombs = spark.read.parquet(
            *[str(store.root / f) for f in tomb_files]
        )
        doc_meta = doc_meta.join(
            old_tombs.select("doc_id"), "doc_id", "left_anti"
        )

    # affected logical keys -> rows to tombstone
    keys = None
    if upserts is not None:
        keys = upserts.select(*LOGICAL_KEY).distinct()
    if deletes is not None:
        dk = deletes.select(*LOGICAL_KEY).distinct()
        keys = dk if keys is None else keys.unionByName(dk).distinct()
    if keys is None:
        return manifest

    removed = doc_meta.join(F.broadcast(keys), LOGICAL_KEY, "left_semi")
    removed = removed.persist()
    n_removed = removed.count()

    if n_removed:
        # 1) tombstones (doc_id, exact analyzed dl)
        tomb_name = f"tombstones/tomb_{uuid.uuid4().hex}.parquet"
        tomb_df = removed.select("doc_id", "content").mapInPandas(
            _removed_doc_dls(analyzer), schema="doc_id long, dl long"
        )
        tomb_df.write.mode("overwrite").parquet(str(store.root / tomb_name))
        sum_dl_removed = (
            spark.read.parquet(str(store.root / tomb_name))
            .agg(F.sum("dl").alias("s"))
            .collect()[0]["s"]
        )
        # 2) per-term df corrections from removed docs' stored content
        ddf = (
            removed.select("content")
            .mapInPandas(_removed_term_dfs(analyzer), schema="term string, ddf long")
            .groupBy("term")
            .agg(F.sum("ddf").alias("ddf"))
        )
        ddf.write.mode("append").parquet(str(store.root / "stats_delta"))
        manifest["tombstones"]["files"].append(tomb_name)
        manifest["tombstones"]["n_docs"] += int(n_removed)
        manifest["tombstones"]["sum_dl"] += int(sum_dl_removed or 0)

    # 3) new segment from upserts (with copy-forward of nullable attrs)
    tombstones = manifest["tombstones"]
    if upserts is not None and upserts.limit(1).count() > 0:
        old_attrs = doc_meta.select(
            *LOGICAL_KEY, F.col("lang").alias("_old_lang")
        )
        merged = (
            upserts.join(F.broadcast(old_attrs), LOGICAL_KEY, "left")
            .withColumn("lang", F.coalesce(F.col("lang"), F.col("_old_lang")))
            .drop("_old_lang")
        )
        build_segment(
            spark,
            merged,
            index_root,
            cfg,
            seg_id=manifest["next_seg_id"],
        )
        # build_segment committed its own manifest (from disk, without our
        # tombstone bookkeeping) — re-read it and graft the tombstones on
        manifest = store.read_manifest()
        manifest["tombstones"] = tombstones

    manifest.setdefault("deltas", []).append(
        {"ts": time.time(), "removed": int(n_removed)}
    )
    store.write_manifest(manifest)
    removed.unpersist()
    return manifest
