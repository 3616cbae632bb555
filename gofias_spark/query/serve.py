"""Term-bucketed parquet serve cache — the low-latency query path.

Motivation (round-2 verdict, top item): the doc_part-partitioned in-memory
postings cache schedules one task per cache partition for EVERY query,
regardless of which terms the query touches — so per-query latency has a
floor proportional to the index's partition count and *rises* with core
count (task-launch overhead scales with concurrently-started Python
workers). A serving query should schedule work proportional to ITS OWN
terms, not to the index size.

Layout: the postings blocks are re-keyed by ``pid = crc32(term) %
n_buckets`` and written ONCE as hive-partitioned parquet
(``pid=K/part-*.parquet``), term-sorted within each file with small row
groups. ``pid`` is driver-computable (``zlib.crc32`` — bit-identical to
Spark's ``crc32(encode(term,'utf-8'))``, parity-tested), so each query's
scan filter ``pid IN (<buckets of its terms>)`` is eliminated at PLANNING
time by Catalyst partition pruning: the job schedules only the file splits
that can contain the query's terms (typically 1-3 tasks, independent of
index size and core count), and the ``term IN (...)`` predicate pushes
down to parquet row-group stats inside them (term-sorted ⇒ tight min/max).
The selected blocks are collected (bounded: the engine routes here only
when Σ df(term) ≤ ``serve_max_postings``) and scored with the SAME numpy
kernels (query/kernel.py) driver-side — identical results to the
distributed path by construction.

At 10^12-doc scale this is the classic two-tier serving split: the vast
majority of queries (Zipf) touch rare-to-moderate terms and read only
their own postings from a term-partitioned store; queries whose posting
volume exceeds the driver budget fall back to the document-partitioned
distributed WAND path (engine.py) where the intersection work spreads over
the cluster. The reference gets the same effect from Lucene's term
dictionary inside each ES shard; Spark-side, hive partition pruning + row-
group pruning ARE the term dictionary.

Attribute-filtered and composite-sorted queries also serve driver-side
when their posting volume fits the (tighter) filtered budget: the kernel
scores ALL candidates (BM25 stats are index-global, so filtering after
scoring is exact), then the filter/sort attributes are read from the
doc_id-sorted meta sidecar — in score order with a probe-then-full
backfill for filters, or in one candidate-set read for sorts. Fields
missing from the sidecar (or over-budget queries) fall back to the
distributed cogroup path, so stale caches degrade gracefully.

The cache lives under ``<index_root>/serve_cache/<token>/`` where the
token fingerprints the manifest's segment state — a delta import
invalidates it naturally; tombstones do NOT invalidate it (they are
applied query-time as an excluded-id mask, exactly like the distributed
path). Falls back to a temp dir when the index root is not writable.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import zlib
from pathlib import Path

import pandas as pd
import pyarrow.dataset as pads
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# columns the scoring kernels consume (doc_part is irrelevant driver-side:
# kernels sort decoded ids globally)
BLOCK_COLS = ["term", "n", "base", "last", "tf_max", "dl_min", "docs", "tfs", "dls"]
# positional-sidecar columns served for fast phrase (block-aligned with the
# postings; ``poss`` = per-posting delta+varbyte token positions)
POS_COLS = ["term", "n", "base", "docs", "tfs", "dls", "poss"]


def _prune_stale(candidates, current: Path, done_name: str) -> None:
    """Best-effort cleanup of stale sibling cache dirs, RETAINING the
    newest COMPLETE predecessor — a rolling reopen may still be serving
    from it. Completeness and age both come from the done-marker file:

    * a partial dir (no marker) never shields a complete predecessor; a
      STALE partial (crashed build) is dropped outright, while a fresh
      one is left alone (another process may be mid-build in it);
    * generation order is the MARKER's mtime, not the dir's — writing a
      stats_* sidecar into an old token dir bumps the dir mtime and
      would otherwise make the stale token look newest;
    * every stat is OSError-guarded: a sibling deleted concurrently by
      another pruner must not crash this build.
    """
    import time

    complete = []
    for p in candidates:
        if p == current:
            continue
        try:
            m = (p / done_name).stat().st_mtime
        except OSError:
            try:
                fresh = time.time() - p.stat().st_mtime < 3600
            except OSError:
                continue
            if not fresh:
                shutil.rmtree(p, ignore_errors=True)
            continue
        complete.append((m, p))
    complete.sort()
    for _, old in complete[:-1]:
        shutil.rmtree(old, ignore_errors=True)


def pid_of(term: str, n_buckets: int) -> int:
    """Driver-side bucket of a term. MUST match the Spark expression in
    ``build`` (pmod over crc32 of the utf-8 bytes): zlib.crc32 returns the
    same unsigned CRC-32 (IEEE) as Spark's ``crc32`` function."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def state_token(manifest: dict, seg_metas: dict) -> str:
    """Fingerprint of the postings-affecting index state: segments and their
    committed partitions. Tombstones/stats deltas excluded — they are
    query-time masks, not postings bytes."""
    state = {
        "segments": sorted(manifest.get("segments", [])),
        "parts": {
            str(s): sorted(
                (p["part"], p.get("rows", 0)) for p in m.partitions
            )
            for s, m in seg_metas.items()
        },
    }
    return hashlib.sha256(
        json.dumps(state, sort_keys=True).encode()
    ).hexdigest()[:16]


class ServeCache:
    def __init__(self, spark: SparkSession, path: str, n_buckets: int):
        self.spark = spark
        self.path = str(path)
        # the bucket count the cache was PHYSICALLY written with is
        # authoritative over the caller's recomputation: pid routing is a
        # pure function of (term, n_buckets), so if the bucket formula in
        # engine code ever changes, an engine reopening an existing _DONE
        # cache would otherwise prune to the wrong pids and silently serve
        # empty results. Caches from before the sidecar existed fall back
        # to the caller's value (same formula that built them).
        nfile = Path(self.path) / "n_buckets.json"
        self.n_buckets = (
            json.loads(nfile.read_text())["n_buckets"]
            if nfile.exists()
            else n_buckets
        )
        # df threshold the cache was built with: terms above it were
        # excluded (they can never be served — any query containing one is
        # over budget). Engines must cap their routing budget to this.
        # Caches from before the threshold existed contain every term.
        tfile = Path(self.path) / "threshold.json"
        self.df_threshold = (
            json.loads(tfile.read_text())["df_threshold"]
            if tfile.exists()
            else float("inf")
        )
        # the EXACT set of terms the build excluded (df > threshold at
        # build time). Routing must consult this set, not live dfs: a
        # delete-only delta lowers df without rotating the postings token,
        # so a term can drop under the threshold while the cache still
        # lacks its postings — threshold-vs-live-df routing would then
        # silently serve empty results for it. None = legacy cache without
        # the file (router falls back to the threshold heuristic).
        xfile = Path(self.path) / "excluded_terms.json"
        self.excluded_terms: set[str] | None = (
            set(json.loads(xfile.read_text())) if xfile.exists() else None
        )
        # one reader DataFrame for the engine's lifetime: the file listing
        # is cached in its InMemoryFileIndex, so per-query planning does not
        # re-list the directory
        self._df = spark.read.parquet(str(Path(self.path) / "postings"))
        # serving-tier readers: pyarrow datasets over the same files. The
        # query hot path reads them DRIVER-side (hive-partition + row-group
        # pruning happen in pyarrow) — zero Spark jobs, so per-query latency
        # is file-IO-bound and independent of core count AND cluster size.
        # On a real deployment the cache lives on shared storage and any
        # serving node reads it the same way (pyarrow accepts fsspec
        # filesystems); the Spark reader above stays for plan tests and as
        # the executor-side path for cache-building jobs.
        self._pads = pads.dataset(
            str(Path(self.path) / "postings"), partitioning="hive"
        )
        meta_dir = Path(self.path) / "meta"
        self._meta_ds = (
            pads.dataset(str(meta_dir)) if meta_dir.exists() else None
        )
        pos_dir = Path(self.path) / "positions"
        self._pos_ds = (
            pads.dataset(str(pos_dir), partitioning="hive")
            if pos_dir.exists()
            else None
        )
        bd_dir = Path(self.path) / "build_dfs"
        self._build_dfs_ds = (
            pads.dataset(str(bd_dir)) if bd_dir.exists() else None
        )

    # -- construction -------------------------------------------------------
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        postings: DataFrame,
        dest: str | Path,
        n_buckets: int,
        token: str,
        doc_meta: DataFrame | None = None,
        df_threshold: int | None = None,
        excluded_terms: list[str] | None = None,
        build_stats: DataFrame | None = None,
        positions: DataFrame | None = None,
    ) -> "ServeCache":
        """Write the term-bucketed cache and return a reader over it.

        One shuffle keyed on pid (bounded: n_buckets targets), term-sorted
        within partitions so the partitionBy write preserves term order per
        file; small parquet row groups keep the in-file term ranges tight
        for row-group pruning. ``doc_meta`` (display columns) is written as
        a doc_id-range-sorted sidecar so the k-row display lookup after
        top-k is a pruned driver-side read too."""
        dest = Path(dest)
        final = dest / token
        if (final / "_DONE").exists():
            return cls(spark, str(final), n_buckets)
        # drop stale tokens (prior index states) best-effort — but RETAIN
        # the newest complete other token: during a rolling reopen an
        # already-open engine may still be serving from it (pyarrow
        # datasets hold file paths, not fds), and deleting it under that
        # engine turns every serve-tier query into an IO error until the
        # swap completes. Repeated builds keep at most one predecessor.
        if dest.exists():
            _prune_stale(dest.iterdir(), final, "_DONE")
        # stage-then-rename claim: each builder writes into its OWN tmp dir
        # and publishes with an atomic rename, so two replicas warming the
        # same token concurrently (rolling restart on shared storage) can
        # never overwrite each other's in-flight Spark output — the loser's
        # rename fails, it discards its copy and reads the winner's.
        import os as _os
        import uuid as _uuid

        staged = dest / f".{token}.tmp-{_os.getpid()}-{_uuid.uuid4().hex[:8]}"
        publish = final
        final = staged  # every write below lands in the staging dir
        (
            postings.select(*BLOCK_COLS)
            .withColumn(
                "pid",
                F.pmod(
                    F.crc32(F.encode(F.col("term"), "utf-8")),
                    F.lit(n_buckets),
                ).cast("int"),
            )
            .repartition(n_buckets, "pid")
            .sortWithinPartitions("term", "base")
            .write.mode("overwrite")
            .option("parquet.block.size", 2 * 1024 * 1024)
            .partitionBy("pid")
            .parquet(str(final / "postings"))
        )
        if positions is not None:
            # the positional sidecar rides the same term-bucketed layout:
            # phrase queries then prune to their terms' pids exactly like
            # term queries do, and the one-pass kernel runs driver-side
            (
                positions.select(*POS_COLS)
                .withColumn(
                    "pid",
                    F.pmod(
                        F.crc32(F.encode(F.col("term"), "utf-8")),
                        F.lit(n_buckets),
                    ).cast("int"),
                )
                .repartition(n_buckets, "pid")
                .sortWithinPartitions("term", "base")
                .write.mode("overwrite")
                .option("parquet.block.size", 2 * 1024 * 1024)
                .partitionBy("pid")
                .parquet(str(final / "positions"))
            )
        if doc_meta is not None:
            (
                doc_meta.repartitionByRange(
                    max(8, n_buckets // 4), "doc_id"
                )
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .option("parquet.block.size", 1024 * 1024)
                .parquet(str(final / "meta"))
            )
        if df_threshold is not None:
            (final / "threshold.json").write_text(
                json.dumps({"df_threshold": int(df_threshold)})
            )
        if excluded_terms is not None:
            (final / "excluded_terms.json").write_text(
                json.dumps(sorted(excluded_terms))
            )
        if build_stats is not None:
            # RAW per-term df at build time (tombstoned docs included) —
            # what the cache physically holds per term. The router reads
            # it in delta state, where live dfs understate the fetch.
            (
                build_stats.repartitionByRange(8, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .option("parquet.block.size", 1024 * 1024)
                .parquet(str(final / "build_dfs"))
            )
        # pid routing is a pure function of (term, n_buckets): persist the
        # build-time bucket count so readers never recompute it from a
        # formula that may have changed between releases
        (final / "n_buckets.json").write_text(
            json.dumps({"n_buckets": int(n_buckets)})
        )
        (final / "_DONE").write_text("")
        try:
            _os.rename(staged, publish)
        except OSError:
            # another builder published this token first — its copy is
            # complete (rename is atomic), so discard ours and read it
            shutil.rmtree(staged, ignore_errors=True)
            if not (publish / "_DONE").exists():
                raise
        return cls(spark, str(publish), n_buckets)

    @staticmethod
    def resolve_dir(index_root: str | Path) -> Path:
        """Preferred cache location: beside the index. Falls back to a temp
        dir (tmpfs when present) if the root is not writable."""
        root = Path(index_root)
        cand = root / "serve_cache"
        try:
            cand.mkdir(parents=True, exist_ok=True)
            probe = cand / ".write_probe"
            probe.write_text("")
            probe.unlink()
            return cand
        except OSError:
            import tempfile

            base = "/dev/shm" if Path("/dev/shm").is_dir() else None
            return Path(tempfile.mkdtemp(prefix="gofias_serve_", dir=base))

    # -- query-time ----------------------------------------------------------
    def scan(self, qterms: list[str]) -> DataFrame:
        """The pruned scan plan for a query's terms (exposed for plan
        tests): pid IN (...) prunes hive partitions at planning time,
        term IN (...) pushes down to row groups."""
        pids = sorted({pid_of(t, self.n_buckets) for t in qterms})
        return self._df.filter(
            F.col("pid").isin(pids) & F.col("term").isin(list(qterms))
        ).select(*BLOCK_COLS)

    def fetch(self, qterms: list[str]) -> pd.DataFrame:
        """Blocks of ``qterms``, read driver-side via pyarrow (no Spark
        job): pid partitions pruned from directory names, term IN (...)
        pruned against row-group stats (term-sorted files ⇒ tight
        min/max), only matching row groups decoded."""
        pids = sorted({pid_of(t, self.n_buckets) for t in qterms})
        tbl = self._pads.to_table(
            columns=BLOCK_COLS,
            filter=pads.field("pid").isin(pids)
            & pads.field("term").isin(list(qterms)),
        )
        return tbl.to_pandas()

    @property
    def has_positions(self) -> bool:
        return self._pos_ds is not None

    def fetch_positions(self, qterms: list[str]) -> pd.DataFrame:
        """Position blocks of ``qterms``, read driver-side via pyarrow —
        same pid/row-group pruning as ``fetch`` over the positional
        sidecar (one-pass phrase input; rows per term arrive base-sorted
        because the build sorts within partitions)."""
        pids = sorted({pid_of(t, self.n_buckets) for t in qterms})
        tbl = self._pos_ds.to_table(
            columns=POS_COLS,
            filter=pads.field("pid").isin(pids)
            & pads.field("term").isin(list(qterms)),
        )
        return tbl.to_pandas()

    def fetch_meta(
        self, doc_ids: list[int], columns: list[str] | None = None
    ) -> pd.DataFrame | None:
        """Meta columns for a doc_id set — pruned driver-side read of the
        doc_id-sorted meta sidecar (None when the sidecar is absent).
        ``columns`` restricts the projection (filter/sort paths read only
        the attribute columns they evaluate).

        Large id sets are evaluated in bounded slices: a single isin
        expression over millions of Python ints spikes driver memory and
        expression-build time, so ids are SORTED (slices become doc_id-range
        local → row-group pruning stays effective on the range-sorted
        sidecar) and read 262k at a time. Callers merge on doc_id, so the
        concat order is irrelevant."""
        if self._meta_ds is None:
            return None
        ids = sorted(int(x) for x in doc_ids)
        step = 262_144
        if not ids:
            return self._meta_ds.to_table(
                columns=columns, filter=pads.field("doc_id").isin([])
            ).to_pandas()
        parts = [
            self._meta_ds.to_table(
                columns=columns,
                filter=pads.field("doc_id").isin(ids[i : i + step]),
            ).to_pandas()
            for i in range(0, len(ids), step)
        ]
        if len(parts) == 1:
            return parts[0]
        return pd.concat(parts, ignore_index=True)

    def meta_columns(self) -> set[str]:
        """Column names available in the meta sidecar (empty when absent) —
        the serve router checks filter/sort fields against this before
        committing a query to the driver-side path."""
        if self._meta_ds is None:
            return set()
        return set(self._meta_ds.schema.names)

    # -- term-stats sidecar --------------------------------------------------
    def attach_stats(self, stats: DataFrame, delta_token: str) -> None:
        """Write (or reopen) the term-sorted (term, df) sidecar for
        vocabularies too large for the driver dict (warm's ``max_terms``).

        Keyed SEPARATELY from the postings token: a delete-only delta
        changes df (tombstones + stats_delta) without changing segment
        state, so postings stay valid while stats must refresh —
        ``delta_token`` fingerprints the tombstone/stats-delta files and a
        reopened engine writes a fresh (vocab-sized, cheap) sidecar next to
        the reused postings."""
        d = Path(self.path) / f"stats_{delta_token}"
        if not (d / "_SUCCESS").exists():
            # same retention as token rotation: keep the newest complete
            # other sidecar for an engine still serving from it mid-swap
            _prune_stale(Path(self.path).glob("stats_*"), d, "_SUCCESS")
            (
                stats.repartitionByRange(8, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .option("parquet.block.size", 1024 * 1024)
                .parquet(str(d))
            )
        self._stats_ds = pads.dataset(str(d))

    def fetch_build_dfs(self, terms: list[str]) -> dict[str, int] | None:
        """Build-time (raw) df per term — the cache's actual per-term
        posting volume. Pruned driver-side read of the term-sorted
        sidecar; None for legacy caches without it."""
        if self._build_dfs_ds is None:
            return None
        tbl = self._build_dfs_ds.to_table(
            filter=pads.field("term").isin(list(terms))
        )
        pdf = tbl.to_pandas()
        return dict(zip(pdf["term"], pdf["df"].astype(int)))

    def fetch_stats(self, terms: list[str]) -> dict[str, int] | None:
        """df for each query term — pruned driver-side read of the
        term-sorted stats sidecar (row-group stats make term IN (...)
        touch only matching groups). None when no sidecar is attached."""
        ds = getattr(self, "_stats_ds", None)
        if ds is None:
            return None
        tbl = ds.to_table(filter=pads.field("term").isin(list(terms)))
        pdf = tbl.to_pandas()
        return dict(zip(pdf["term"], pdf["df"].astype(int)))
