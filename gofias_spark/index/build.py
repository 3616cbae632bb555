"""Index build: docs table -> compressed postings + doc_meta + term_stats.

Replaces the reference's import pipeline (XML stream -> row-by-row ES bulk,
/root/reference/app/domain/address/service/importService.go:153-189 +
elasticAddressRepository.go:648-732 — where Lucene then builds the actual
index) with one declarative Spark lineage:

    docs ── assign_doc_ids (range-partition rank, deterministic)
         ── sha256/doc_part projection
         ── groupBy(doc_part).applyInPandas(tokenize + encode)   [Arrow]
         ── write postings/doc_meta partitioned by doc_part
         ── promote partitions + record lineage  (resumable checkpoint)
         ── term_stats aggregation (groupBy(term).sum — tiny shuffle)

Scale notes (100 TB / 10^12 files):
  * the only full-data shuffle is the repartition of raw docs onto their
    doc_part (and that is near-local because doc_ids are range-assigned);
    tokenization and posting encoding never shuffle token-level rows.
  * hot terms are split across every doc_part (document-partitioned index),
    so no groupBy(term) ever sees a whole hot posting list — term-level
    aggregation only moves (term, partial_df) rows.
  * per-partition outputs are committed independently (atomic dir rename +
    lineage row); a killed build resumes from the manifest skip-list.
"""

from __future__ import annotations

import time
from dataclasses import asdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gofias_spark.analyzer import term_frequencies
from gofias_spark.config import IndexConfig
from gofias_spark.corpus import assign_doc_ids, with_doc_meta
from gofias_spark.index.codec import encode_blocks_batch
from gofias_spark.index.store import IndexStore, PartitionLineage, SegmentMeta

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_part", T.LongType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("base", T.LongType(), False),
        T.StructField("last", T.LongType(), False),
        T.StructField("docs", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("tf_max", T.LongType(), False),
        T.StructField("dl_min", T.LongType(), False),
        T.StructField("tf_sum", T.LongType(), False),
    ]
)

DOC_META_COLS = [
    "doc_id", "repo", "path", "commit", "lang", "content", "sha256",
    "doclen", "doc_part",
]


def _encode_partition_factory(cfg: IndexConfig):
    analyzer, block_size = cfg.analyzer, cfg.block_size

    def encode_partition(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        doc_part = int(key[0])
        try:
            # Arrow-native fast path (standard analyzer): contiguous-buffer
            # tokenize+count, no per-token Python objects — see
            # analyzer.term_frequencies_coded for why this matters at high
            # worker concurrency.
            from gofias_spark.analyzer import term_frequencies_coded

            res = term_frequencies_coded(
                pdf["doc_id"].to_numpy(), pdf["content"], analyzer
            )
            if res["doc_id"].size == 0:
                return pd.DataFrame(
                    {f.name: pd.Series(dtype="object") for f in BLOCK_SCHEMA}
                )
            cols = encode_blocks_batch(
                res["term_codes"], res["doc_id"], res["tf"], res["dl"],
                block_size,
            )
            import pyarrow as pa
            import pyarrow.compute as pc

            term_strs = pc.take(
                res["uniq_terms"], pa.array(cols["term"], type=pa.int64())
            )
            cols = dict(cols)
            cols["term"] = term_strs.to_pandas()
        except ValueError:
            tf = term_frequencies(pdf["doc_id"], pdf["content"], analyzer)
            if len(tf) == 0:
                return pd.DataFrame(
                    {f.name: pd.Series(dtype="object") for f in BLOCK_SCHEMA}
                )
            tf = tf.sort_values(["term", "doc_id"], kind="mergesort")
            cols = encode_blocks_batch(
                tf["term"].to_numpy(),
                tf["doc_id"].to_numpy(dtype=np.int64),
                tf["tf"].to_numpy(dtype=np.uint64),
                tf["dl"].to_numpy(dtype=np.uint64),
                block_size,
            )
        out = pd.DataFrame(cols)
        out["doc_part"] = doc_part
        return out[[f.name for f in BLOCK_SCHEMA]]

    return encode_partition


def prepare_docs(
    docs: DataFrame, cfg: IndexConfig, seg_id: int = 0
) -> DataFrame:
    """docs -> docs + (doc_id, doc_part, sha256, doclen).

    One shuffle total (the bucket repartition inside assign_doc_ids); the
    window rank, sha256/doclen projections, doc_meta write and the encode
    groupBy all run on that partitioning without further exchanges.

    ``doclen`` here is the JVM-computed standard token count (informational
    display column; whole-stage codegen, no extra Python pass). The exact
    *analyzed* dl used for BM25 lives inside the postings (codec ``dls``) and
    in segment ``sum_dl``; tombstone accounting re-derives exact dl from the
    removed docs' content at merge time (delta-sized work)."""
    return with_doc_meta(assign_doc_ids(docs, cfg.n_buckets, seg_id))


def build_segment(
    spark: SparkSession,
    docs: DataFrame,
    index_root: str,
    cfg: IndexConfig | None = None,
    seg_id: int | None = None,
    _fail_after_parts: int | None = None,
) -> dict:
    """Build (or resume) one segment from a docs DataFrame.

    Returns the updated manifest. ``_fail_after_parts`` is a fault-injection
    hook for resume tests: abort after committing that many partitions.
    """
    cfg = cfg or IndexConfig()
    store = IndexStore(index_root)
    manifest = store.read_manifest()
    if seg_id is None:
        seg_id = manifest["next_seg_id"]

    # Cache only the ranked base columns. sha256/doclen are cheap JVM
    # expressions but caching them (plus re-reading the wider cache) costs
    # more than recomputing: they are projected lazily into the doc_meta
    # write below and never materialized twice.
    prepared = assign_doc_ids(docs, cfg.n_buckets, seg_id).persist()
    committed = store.committed_parts(seg_id)
    todo = prepared.filter(~F.col("doc_part").isin(list(committed)) if committed else F.lit(True))

    t0 = time.time()
    staging = store.staging_dir()

    # --- doc_meta + postings for not-yet-committed partitions -------------
    todo_meta = with_doc_meta(todo).select(*DOC_META_COLS)
    todo_meta.write.partitionBy("doc_part").mode("overwrite").parquet(
        str(staging / "doc_meta")
    )
    blocks = (
        todo.select("doc_part", "doc_id", "content")
        .groupBy("doc_part")
        .applyInPandas(_encode_partition_factory(cfg), schema=BLOCK_SCHEMA)
    )
    (
        blocks.sortWithinPartitions("term", "block_id")
        .write.partitionBy("doc_part")
        .mode("overwrite")
        .parquet(str(staging / "postings"))
    )

    # --- per-partition lineage metrics (from the staged outputs) ----------
    part_stats = {
        int(r["doc_part"]): (int(r["rows"]), int(r["sum_dl"] or 0))
        for r in spark.read.parquet(str(staging / "postings"))
        .groupBy("doc_part")
        .agg(F.count("*").alias("rows"), F.sum("tf_sum").alias("sum_dl"))
        .collect()
    }
    doc_stats = {
        int(r["doc_part"]): int(r["n_docs"])
        for r in spark.read.parquet(str(staging / "doc_meta"))
        .groupBy("doc_part")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    }

    # --- promote partition dirs + lineage rows, atomically per partition --
    seg_meta_existing = (
        store.read_seg_meta(seg_id)
        if (store.seg_dir(seg_id) / "meta.json").exists()
        else SegmentMeta(
            seg_id=seg_id,
            n_docs=0,
            sum_dl=0,
            min_doc_id=0,
            max_doc_id=-1,
            analyzer=asdict(cfg.analyzer),
            partitions=[],
        )
    )
    elapsed = time.time() - t0
    moved_meta = store.promote_partition_dirs(staging, seg_id, "doc_meta")
    n_done = 0
    # promote postings per-partition so fault injection leaves a clean prefix
    dest_root = store.seg_dir(seg_id) / "postings"
    dest_root.mkdir(parents=True, exist_ok=True)
    for part in sorted(set(moved_meta) | set(part_stats)):
        src = staging / "postings" / f"doc_part={part}"
        if src.exists():
            dest = dest_root / f"doc_part={part}"
            if not dest.exists():
                src.rename(dest)
        rows, sum_dl = part_stats.get(part, (0, 0))
        lineage = PartitionLineage(
            part=part,
            rows=rows,
            n_docs=doc_stats.get(part, 0),
            sum_dl=sum_dl,
            build_secs=round(elapsed, 3),
        )
        seg_meta_existing.partitions.append(asdict(lineage))
        n_done += 1
        store.write_seg_meta(_normalize_meta(seg_meta_existing))
        if _fail_after_parts is not None and n_done >= _fail_after_parts:
            raise RuntimeError(
                f"fault injection: aborted after {n_done} partitions"
            )

    # --- segment-level stats + term_stats ---------------------------------
    seg_meta = _normalize_meta(seg_meta_existing)
    parts = seg_meta.partitions
    seg_meta.n_docs = sum(p["n_docs"] for p in parts)
    seg_meta.sum_dl = sum(p["sum_dl"] for p in parts)
    id_bounds = prepared.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    seg_meta.min_doc_id = int(id_bounds["lo"] if id_bounds["lo"] is not None else 0)
    seg_meta.max_doc_id = int(id_bounds["hi"] if id_bounds["hi"] is not None else -1)
    store.write_seg_meta(seg_meta)

    postings = spark.read.parquet(str(store.seg_dir(seg_id) / "postings"))
    (
        postings.groupBy("term")
        .agg(F.sum("n").alias("df"))
        .repartition(1)
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(str(store.seg_dir(seg_id) / "term_stats"))
    )

    # --- manifest commit ---------------------------------------------------
    segs = [s for s in manifest["segments"] if s != seg_id]
    segs.append(seg_id)
    manifest["segments"] = sorted(segs)
    manifest["next_seg_id"] = max(manifest["next_seg_id"], seg_id + 1)
    manifest["next_doc_id"] = max(
        manifest["next_doc_id"], seg_meta.max_doc_id + 1
    )
    manifest["config"]["analyzer"] = asdict(cfg.analyzer)
    manifest["config"]["n_buckets"] = cfg.n_buckets
    manifest["config"].pop("docs_per_part", None)
    manifest["config"]["block_size"] = cfg.block_size
    store.write_manifest(manifest)
    store.cleanup_staging()
    prepared.unpersist()
    return manifest


def _normalize_meta(meta: SegmentMeta) -> SegmentMeta:
    """Lineage entries may be dataclasses or dicts; keep dicts, dedupe by part
    (last write wins — re-promoted partitions after resume)."""
    norm: dict[int, dict] = {}
    for p in meta.partitions:
        d = asdict(p) if hasattr(p, "__dataclass_fields__") else dict(p)
        norm[d["part"]] = d
    meta.partitions = [norm[k] for k in sorted(norm)]
    return meta
