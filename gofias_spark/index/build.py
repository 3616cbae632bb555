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
from gofias_spark.corpus import assign_doc_ids, with_doc_meta, with_doc_part
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


def _fused_encode_factory(
    cfg: IndexConfig,
    staging_meta_dir: str,
    staging_stats_dir: str | None = None,
    staging_pos_dir: str | None = None,
):
    """applyInArrow kernel: one pass over each doc_part group produces BOTH
    outputs — posting blocks (returned to Spark) and the doc_meta parquet
    file (side-written by the worker via pyarrow, atomic tmp+rename).

    This is the core of the single-pass build: content crosses the
    JVM->Python Arrow boundary exactly once, sha256 and the EXACT analyzed
    doclen are computed where the tokens already are, and no second
    content-wide stage (or content cache) exists. The side-write commits
    into the same ``_staging`` tree the promote/lineage protocol already
    manages; task retries overwrite deterministically (atomic os.replace,
    identical bytes)."""
    analyzer, block_size = cfg.analyzer, cfg.block_size

    def encode_group(key, tbl):
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from gofias_spark.analyzer import (
            term_frequencies_coded,
            tokenize_series,
        )
        from gofias_spark.config import RANK_BITS
        from gofias_spark.index.codec import encode_blocks_arrow

        doc_part = int(key[0].as_py() if hasattr(key[0], "as_py") else key[0])
        # doc_id assignment happens HERE, not in a JVM window: rank the
        # bucket's rows by identity key (vectorized Arrow sort over the THREE
        # KEY COLUMNS ONLY — the content strings are never reordered or
        # copied). Deterministic and parallelism-invariant (the bucket's key
        # set does not depend on partitioning), and it removes an entire JVM
        # sort-by-3-string-columns pass over the content from the build.
        order = pc.sort_indices(
            tbl.select(["repo", "path", "commit"]),
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit", "ascending"),
            ],
            # match Spark's asc-nulls-FIRST (the two-pass path ranks via a
            # JVM window orderBy asc): a null identity key must produce the
            # same doc_id under either build mode (ADVICE r02)
            null_placement="at_start",
        ).to_numpy(zero_copy_only=False)
        n_rows = tbl.num_rows
        rank_of_pos = np.empty(n_rows, dtype=np.int64)
        rank_of_pos[order] = np.arange(n_rows, dtype=np.int64)
        ids = (doc_part << RANK_BITS) + rank_of_pos
        content = tbl["content"].combine_chunks()
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()

        try:
            res = term_frequencies_coded(
                ids, content, analyzer,
                with_positions=staging_pos_dir is not None,
            )
            doc_dl = res["doc_dl"][: len(ids)]
            coded = True
        except ValueError:
            if staging_pos_dir is not None:
                # the positions sidecar exists only on the coded path
                # (build_segment validates this up front) — never silently
                # build a positions-less segment the manifest claims has one
                raise
            import pandas as pd

            texts = content.to_pandas()
            toks = tokenize_series(texts, analyzer)
            doc_dl = toks.map(len).to_numpy(dtype=np.int64)
            tf = term_frequencies(pd.Series(ids), texts, analyzer)
            tf = tf.sort_values(["term", "doc_id"], kind="mergesort")
            coded = False

        # ---- side output: doc_meta for this partition --------------------
        # sha256 arrives precomputed from the JVM projection (scales with
        # cores; avoids materializing 15k python strings per group here)
        meta_tbl = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "repo": tbl["repo"],
                "path": tbl["path"],
                "commit": tbl["commit"],
                "lang": tbl["lang"],
                "content": tbl["content"],
                "sha256": tbl["sha256"],
                "doclen": pa.array(doc_dl.astype(np.int32), type=pa.int32()),
            }
        )
        part_dir = os.path.join(staging_meta_dir, f"doc_part={doc_part}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, f".data.parquet.tmp{os.getpid()}")
        # zstd-1: 37% smaller than snappy on source text for +5ms/group —
        # the doc store dominates index bytes at scale, and fewer written
        # pages also means less kernel-side allocation churn on tmpfs
        pq.write_table(meta_tbl, tmp, compression="zstd", compression_level=1)
        os.replace(tmp, os.path.join(part_dir, "data.parquet"))

        # ---- main output: posting blocks ----------------------------------
        if coded:
            if res["doc_id"].size == 0:
                _write_part_stats(part_dir, doc_part, 0, ids, doc_dl)
                return _empty_block_table()
            cols = encode_blocks_arrow(
                res["term_codes"], res["doc_id"], res["tf"], res["dl"],
                block_size,
            )
            term_col = pc.take(
                res["uniq_terms"], pa.array(cols["term"], type=pa.int64())
            )
            if staging_pos_dir is not None:
                # positional sidecar: block-aligned with the postings rows
                # (identical run-detection/block split in the codec),
                # self-contained (docs/tfs repeated) so phrase verification
                # reads ONE table and never touches the doc store
                from gofias_spark.index.codec import encode_positions_stream

                pstream, pbounds = encode_positions_stream(
                    res["term_codes"], res["tf"], res["positions"],
                    block_size,
                )
                if pbounds[-1] > np.iinfo(np.int32).max:
                    raise ValueError(
                        "positions stream > 2 GiB in one partition; "
                        "raise n_buckets"
                    )
                poss_col = pa.Array.from_buffers(
                    pa.binary(),
                    len(pbounds) - 1,
                    [
                        None,
                        pa.py_buffer(pbounds.astype(np.int32).tobytes()),
                        pa.py_buffer(pstream),
                    ],
                )
                pos_tbl = pa.table(
                    {
                        "term": term_col,
                        "block_id": pa.array(
                            np.asarray(cols["block_id"], dtype=np.int32),
                            type=pa.int32(),
                        ),
                        "n": pa.array(
                            np.asarray(cols["n"], dtype=np.int32),
                            type=pa.int32(),
                        ),
                        "base": pa.array(cols["base"], type=pa.int64()),
                        "last": pa.array(cols["last"], type=pa.int64()),
                        "docs": cols["docs"],
                        "tfs": cols["tfs"],
                        "dls": cols["dls"],
                        "poss": poss_col,
                    }
                )
                pdir = os.path.join(staging_pos_dir, f"doc_part={doc_part}")
                os.makedirs(pdir, exist_ok=True)
                ptmp = os.path.join(pdir, f".data.parquet.tmp{os.getpid()}")
                pq.write_table(pos_tbl, ptmp, compression="zstd",
                               compression_level=1)
                os.replace(ptmp, os.path.join(pdir, "data.parquet"))
        else:
            if len(tf) == 0:
                _write_part_stats(part_dir, doc_part, 0, ids, doc_dl)
                return _empty_block_table()
            cols = encode_blocks_arrow(
                tf["term"].to_numpy(),
                tf["doc_id"].to_numpy(dtype=np.int64),
                tf["tf"].to_numpy(dtype=np.uint64),
                tf["dl"].to_numpy(dtype=np.uint64),
                block_size,
            )
            term_col = pa.array(cols["term"], type=pa.string())
        nb = len(term_col)
        _write_part_stats(part_dir, doc_part, nb, ids, doc_dl)
        if staging_stats_dir is not None:
            # per-partition (term, df): the whole term_stats table falls out
            # of the data already in hand — no separate Spark aggregation job
            if coded:
                codes = res["term_codes"]
                run_starts = np.flatnonzero(
                    np.r_[True, codes[1:] != codes[:-1]]
                )
                dfs = np.diff(np.append(run_starts, codes.size))
                uterms = pc.take(
                    res["uniq_terms"],
                    pa.array(codes[run_starts], type=pa.int64()),
                )
            else:
                g = tf.groupby("term", sort=True).size()
                uterms = pa.array(g.index.to_numpy(), type=pa.string())
                dfs = g.to_numpy()
            ts_dir = os.path.join(
                staging_stats_dir, f"doc_part={doc_part}"
            )
            os.makedirs(ts_dir, exist_ok=True)
            ttmp = os.path.join(ts_dir, f".data.parquet.tmp{os.getpid()}")
            pq.write_table(
                pa.table(
                    {"term": uterms,
                     "df": pa.array(dfs.astype(np.int64), type=pa.int64())}
                ),
                ttmp, compression="snappy",
            )
            os.replace(ttmp, os.path.join(ts_dir, "data.parquet"))
        return pa.table(
            {
                "term": term_col,
                "doc_part": pa.array(
                    np.full(nb, doc_part, dtype=np.int64), type=pa.int64()
                ),
                "block_id": pa.array(
                    np.asarray(cols["block_id"], dtype=np.int32),
                    type=pa.int32(),
                ),
                "n": pa.array(
                    np.asarray(cols["n"], dtype=np.int32), type=pa.int32()
                ),
                "base": pa.array(cols["base"], type=pa.int64()),
                "last": pa.array(cols["last"], type=pa.int64()),
                "docs": cols["docs"],
                "tfs": cols["tfs"],
                "dls": cols["dls"],
                "tf_max": pa.array(cols["tf_max"], type=pa.int64()),
                "dl_min": pa.array(cols["dl_min"], type=pa.int64()),
                "tf_sum": pa.array(cols["tf_sum"], type=pa.int64()),
            }
        )

    return encode_group


def _write_part_stats(part_dir: str, doc_part: int, nb: int, ids, doc_dl):
    """Side stats next to the partition's doc_meta: everything the lineage /
    manifest needs is known inside the kernel — the driver reads these tiny
    JSONs instead of running 3 extra Spark jobs per build (staged postings
    stats, staged doc_meta stats, id-bounds scan). The `_` prefix keeps
    parquet directory readers from touching it."""
    import json as _json
    import os

    n = int(len(ids))
    ids_np = np.asarray(ids)
    stats = {
        "part": int(doc_part),
        "rows": int(nb),
        "n_docs": n,
        "sum_dl": int(np.asarray(doc_dl).sum()) if n else 0,
        "min_doc_id": int(ids_np.min()) if n else 0,
        "max_doc_id": int(ids_np.max()) if n else -1,
    }
    tmp = os.path.join(part_dir, f"._stats.json.tmp{os.getpid()}")
    with open(tmp, "w") as f:
        _json.dump(stats, f)
    os.replace(tmp, os.path.join(part_dir, "_stats.json"))


def _empty_block_table():
    import pyarrow as pa

    return pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "doc_part": pa.array([], type=pa.int64()),
            "block_id": pa.array([], type=pa.int32()),
            "n": pa.array([], type=pa.int32()),
            "base": pa.array([], type=pa.int64()),
            "last": pa.array([], type=pa.int64()),
            "docs": pa.array([], type=pa.binary()),
            "tfs": pa.array([], type=pa.binary()),
            "dls": pa.array([], type=pa.binary()),
            "tf_max": pa.array([], type=pa.int64()),
            "dl_min": pa.array([], type=pa.int64()),
            "tf_sum": pa.array([], type=pa.int64()),
        }
    )


def prepare_docs(
    docs: DataFrame, cfg: IndexConfig, seg_id: int = 0
) -> DataFrame:
    """docs -> docs + (doc_id, doc_part, sha256, doclen).

    One shuffle total (the bucket repartition inside assign_doc_ids); the
    window rank, sha256/doclen projections, doc_meta write and the encode
    groupBy all run on that partitioning without further exchanges.
    ``doclen`` is the exact analyzed length under the config's analyzer
    (JVM expression, whole-stage codegen)."""
    return with_doc_meta(
        assign_doc_ids(docs, cfg.n_buckets, seg_id), cfg.analyzer
    )


def _encode_only_factory(cfg: IndexConfig):
    """applyInArrow kernel for the two-pass (non-shared-FS) build: input
    groups carry precomputed doc_ids; output is the posting-block table
    only — no executor side-writes of any kind."""
    analyzer, block_size = cfg.analyzer, cfg.block_size

    def encode_group(key, tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        from gofias_spark.analyzer import term_frequencies_coded
        from gofias_spark.index.codec import encode_blocks_arrow

        doc_part = int(key[0].as_py() if hasattr(key[0], "as_py") else key[0])
        ids = tbl["doc_id"].to_numpy()
        content = tbl["content"].combine_chunks()
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        try:
            res = term_frequencies_coded(ids, content, analyzer)
            if res["doc_id"].size == 0:
                return _empty_block_table()
            cols = encode_blocks_arrow(
                res["term_codes"], res["doc_id"], res["tf"], res["dl"],
                block_size,
            )
            term_col = pc.take(
                res["uniq_terms"], pa.array(cols["term"], type=pa.int64())
            )
        except ValueError:  # custom token_pattern: pandas fallback
            import pandas as pd

            texts = content.to_pandas()
            tf = term_frequencies(pd.Series(ids), texts, analyzer)
            if len(tf) == 0:
                return _empty_block_table()
            tf = tf.sort_values(["term", "doc_id"], kind="mergesort")
            cols = encode_blocks_arrow(
                tf["term"].to_numpy(),
                tf["doc_id"].to_numpy(dtype=np.int64),
                tf["tf"].to_numpy(dtype=np.uint64),
                tf["dl"].to_numpy(dtype=np.uint64),
                block_size,
            )
            term_col = pa.array(cols["term"], type=pa.string())
        nb = len(term_col)
        return pa.table(
            {
                "term": term_col,
                "doc_part": pa.array(
                    np.full(nb, doc_part, dtype=np.int64), type=pa.int64()
                ),
                "block_id": pa.array(
                    np.asarray(cols["block_id"], dtype=np.int32),
                    type=pa.int32(),
                ),
                "n": pa.array(
                    np.asarray(cols["n"], dtype=np.int32), type=pa.int32()
                ),
                "base": pa.array(cols["base"], type=pa.int64()),
                "last": pa.array(cols["last"], type=pa.int64()),
                "docs": cols["docs"],
                "tfs": cols["tfs"],
                "dls": cols["dls"],
                "tf_max": pa.array(cols["tf_max"], type=pa.int64()),
                "dl_min": pa.array(cols["dl_min"], type=pa.int64()),
                "tf_sum": pa.array(cols["tf_sum"], type=pa.int64()),
            }
        )

    return encode_group


def _two_pass_build(
    spark: SparkSession, todo: DataFrame, staging, cfg: IndexConfig,
    seg_id: int,
) -> dict[int, dict]:
    """Cluster-portable build: NO executor side-writes — every output goes
    through Spark's committers, so it works when executors and driver do not
    share a filesystem (object stores, real clusters).

    Pass 1: rank doc_ids (JVM window) + write doc_meta partitioned by
    doc_part. Pass 2: re-read the staged doc_meta (columnar; only doc_id +
    content cross to Python) and encode postings. term_stats and the
    per-partition lineage metrics come from column-pruned aggregations over
    the staged outputs (term/n and doclen/doc_id columns only — the content
    bytes are never read back). Costs one extra content pass vs the fused
    shared-FS path; identical output format and determinism (same hash
    bucketing, same in-bucket key ranking)."""
    ranked = with_doc_meta(
        assign_doc_ids(todo.drop("doc_part"), cfg.n_buckets, seg_id),
        cfg.analyzer,
    )
    (
        ranked.select(
            "doc_part", "doc_id", "repo", "path", "commit", "lang",
            "content", "sha256", "doclen",
        )
        .write.partitionBy("doc_part")
        .mode("overwrite")
        .parquet(str(staging / "doc_meta"))
    )
    meta_back = spark.read.parquet(str(staging / "doc_meta")).withColumn(
        "doc_part", F.col("doc_part").cast("long")
    )
    blocks = (
        meta_back.select("doc_part", "doc_id", "content")
        .repartition(cfg.n_buckets, "doc_part")
        .groupBy("doc_part")
        .applyInArrow(_encode_only_factory(cfg), schema=BLOCK_SCHEMA)
    )
    (
        blocks.write.partitionBy("doc_part")
        .mode("overwrite")
        .parquet(str(staging / "postings"))
    )
    staged_postings = spark.read.parquet(str(staging / "postings")).withColumn(
        "doc_part", F.col("doc_part").cast("long")
    )
    (
        staged_postings.select("doc_part", "term", "n")
        .groupBy("doc_part", "term")
        .agg(F.sum("n").alias("df"))
        .write.partitionBy("doc_part")
        .mode("overwrite")
        .parquet(str(staging / "term_stats"))
    )
    meta_agg = {
        int(r["doc_part"]): r
        for r in meta_back.groupBy("doc_part")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doclen").alias("sum_dl"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .collect()
    }
    block_rows = {
        int(r["doc_part"]): int(r["rows"])
        for r in staged_postings.groupBy("doc_part")
        .agg(F.count("*").alias("rows"))
        .collect()
    }
    return {
        part: {
            "part": part,
            "rows": block_rows.get(part, 0),
            "n_docs": int(r["n_docs"]),
            "sum_dl": int(r["sum_dl"] or 0),
            "min_doc_id": int(r["min_doc_id"]),
            "max_doc_id": int(r["max_doc_id"]),
        }
        for part, r in meta_agg.items()
    }


def build_segment(
    spark: SparkSession,
    docs: DataFrame,
    index_root: str,
    cfg: IndexConfig | None = None,
    seg_id: int | None = None,
    shared_staging_fs: bool = True,
    _fail_after_parts: int | None = None,
) -> dict:
    """Build (or resume) one segment from a docs DataFrame.

    ``shared_staging_fs=True`` (default): the fused single-pass build —
    fastest, but its kernel side-writes doc_meta/term_stats into the staging
    tree, which requires executors to share the driver's filesystem (local
    mode, NFS, fuse-mounted object store). Set ``False`` on deployments
    where they don't: the two-pass build routes every output through
    Spark's committers (one extra content pass; identical index bytes).

    Returns the updated manifest. ``_fail_after_parts`` is a fault-injection
    hook for resume tests: abort after committing that many partitions.
    """
    cfg = cfg or IndexConfig()
    if cfg.positions:
        if cfg.analyzer.mode != "standard":
            raise ValueError(
                "positions=True requires the standard analyzer "
                f"(got mode={cfg.analyzer.mode!r})"
            )
        if cfg.analyzer.token_pattern != r"\w+":
            raise ValueError(
                "positions=True requires the coded \\w+ token pattern"
            )
        if not shared_staging_fs:
            raise ValueError(
                "positions=True is not yet supported by the two-pass "
                "build; use shared_staging_fs=True"
            )
    store = IndexStore(index_root)
    manifest = store.read_manifest()
    if seg_id is None:
        seg_id = manifest["next_seg_id"]

    tagged = with_doc_part(docs, cfg.n_buckets, seg_id)
    committed = store.committed_parts(seg_id)
    todo = tagged.filter(~F.col("doc_part").isin(list(committed)) if committed else F.lit(True))

    t0 = time.time()
    staging = store.staging_dir()

    # --- fused single pass: postings + doc_meta for todo partitions --------
    # One scan, one shuffle (the groupBy(doc_part) exchange — the ONLY
    # content-wide data movement of the build), one Arrow crossing: the group
    # kernel sorts the bucket by identity key, assigns deterministic doc_ids,
    # encodes posting blocks AND side-writes the partition's doc_meta parquet
    # (with the exact analyzed doclen). No JVM window/string-sort, no content
    # cache, no second content-wide stage. Rows leave the kernel sorted by
    # (term, block_id); each doc_part is exactly one group, so the
    # partitionBy write preserves that order per file (parquet row-group
    # pruning on `term` depends on it).
    if shared_staging_fs:
        (staging / "doc_meta").mkdir(parents=True, exist_ok=True)
        (staging / "term_stats").mkdir(parents=True, exist_ok=True)
        if cfg.positions:
            (staging / "positions").mkdir(parents=True, exist_ok=True)
        blocks = (
            todo.select(
                "doc_part", "repo", "path", "commit", "lang", "content",
                F.sha2(F.col("content"), 256).alias("sha256"),
            )
            # one task per bucket: the explicit n_buckets-way hash
            # repartition on doc_part satisfies the groupBy clustering (no
            # second exchange) and keeps each task's Arrow working set at
            # one bucket (~cache-sized) — letting the groupBy default to
            # spark.sql.shuffle.partitions packs many buckets per task and
            # the large transient buffers collapse into kernel page-fault
            # churn at high core counts
            .repartition(cfg.n_buckets, "doc_part")
            .groupBy("doc_part")
            .applyInArrow(
                _fused_encode_factory(
                    cfg,
                    str(staging / "doc_meta"),
                    str(staging / "term_stats"),
                    str(staging / "positions") if cfg.positions else None,
                ),
                schema=BLOCK_SCHEMA,
            )
        )
        (
            blocks.write.partitionBy("doc_part")
            .mode("overwrite")
            .parquet(str(staging / "postings"))
        )

        # --- per-partition lineage metrics (kernel-side stats JSONs) -------
        import json as _json

        part_stats: dict[int, dict] = {}
        for sp in (staging / "doc_meta").glob("doc_part=*/_stats.json"):
            s = _json.loads(sp.read_text())
            part_stats[int(s["part"])] = s

        # The side-write protocol requires executors to share the staging
        # filesystem with the driver (true in local mode, NFS, or any
        # fuse-mounted object store). If the kernels ran but the driver sees
        # no stats, the deployment violates that assumption — fail loudly
        # rather than silently committing an empty segment (ADVICE r01).
        if not part_stats and todo.limit(1).count() > 0:
            raise RuntimeError(
                "fused build kernels produced no partition stats in "
                f"{staging}/doc_meta — executors do not share the driver's "
                "staging filesystem; pass shared_staging_fs=False to use "
                "the two-pass build (all outputs via Spark committers)"
            )
    else:
        part_stats = _two_pass_build(spark, todo, staging, cfg, seg_id)

    # --- promote partition dirs + lineage rows, atomically per partition --
    seg_meta_existing = store.read_seg_meta_merged(
        seg_id,
        SegmentMeta(
            seg_id=seg_id,
            n_docs=0,
            sum_dl=0,
            min_doc_id=0,
            max_doc_id=-1,
            analyzer=asdict(cfg.analyzer),
            partitions=[],
        ),
    )
    elapsed = time.time() - t0
    store.promote_partition_dirs(staging, seg_id, "term_stats")
    if cfg.positions:
        store.promote_partition_dirs(staging, seg_id, "positions")
    moved_meta = store.promote_partition_dirs(staging, seg_id, "doc_meta")
    n_done = 0
    # promote postings per-partition so fault injection leaves a clean prefix;
    # each partition's lineage row is an O(1) append to lineage.jsonl (folded
    # into meta.json once below) — per-partition durability without the
    # quadratic rewrite-meta-per-partition cost
    dest_root = store.seg_dir(seg_id) / "postings"
    dest_root.mkdir(parents=True, exist_ok=True)
    prior_committed = store.committed_parts(seg_id)
    for part in sorted(set(moved_meta) | set(part_stats)):
        src = staging / "postings" / f"doc_part={part}"
        if src.exists():
            store.promote_dir(
                src,
                dest_root / f"doc_part={part}",
                committed=part in prior_committed,
            )
        s = part_stats.get(part, {})
        lineage = PartitionLineage(
            part=part,
            rows=int(s.get("rows", 0)),
            n_docs=int(s.get("n_docs", 0)),
            sum_dl=int(s.get("sum_dl", 0)),
            build_secs=round(elapsed, 3),
            min_doc_id=int(s.get("min_doc_id", 0)),
            max_doc_id=int(s.get("max_doc_id", -1)),
        )
        seg_meta_existing.partitions.append(asdict(lineage))
        n_done += 1
        store.append_lineage(seg_id, asdict(lineage))
        if _fail_after_parts is not None and n_done >= _fail_after_parts:
            raise RuntimeError(
                f"fault injection: aborted after {n_done} partitions"
            )

    # --- segment-level stats + term_stats ---------------------------------
    seg_meta = _normalize_meta(seg_meta_existing)
    parts = seg_meta.partitions
    seg_meta.n_docs = sum(p["n_docs"] for p in parts)
    seg_meta.sum_dl = sum(p["sum_dl"] for p in parts)
    # min/max doc_id over the whole segment (committed + just-promoted) from
    # the doc_meta parquet footer stats — no recompute of the ranked lineage
    # only lineage rows that actually carry id bounds participate (v1-era
    # rows lack them; defaulting those to 0/-1 would corrupt the segment
    # bounds on resume — ADVICE r01)
    live = [p for p in parts if p.get("n_docs", 0) > 0]
    with_bounds = [
        p for p in live if "min_doc_id" in p and "max_doc_id" in p
    ]
    mins = [p["min_doc_id"] for p in with_bounds]
    maxs = [p["max_doc_id"] for p in with_bounds]
    if len(with_bounds) < len(live) and seg_meta.max_doc_id >= seg_meta.min_doc_id:
        # some live partitions are v1-era rows without id bounds: the prior
        # meta.json bounds cover them — seed the fold so the segment bound
        # can only widen, never narrow (ADVICE r02)
        mins.append(seg_meta.min_doc_id)
        maxs.append(seg_meta.max_doc_id)
    if mins:
        seg_meta.min_doc_id = min(mins)
        seg_meta.max_doc_id = max(maxs)
    store.compact_lineage(seg_meta)

    # term_stats: written per-partition by the kernel and promoted above;
    # the engine aggregates (groupBy term) across partitions/segments at load

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
    manifest["config"]["positions"] = bool(cfg.positions)
    store.write_manifest(manifest)
    store.cleanup_staging()
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
