"""Input adapter: the north-rule docs table from an Iceberg catalog.

The engine's input contract is a five-column frame
``(repo, path, commit, lang, content)`` (``corpus.DOCS_SCHEMA``). At
deployment scale that table lives in an Iceberg catalog (north rule:
"over Iceberg tables of source-code repositories at 10^12-file scale");
in tests and benches it is deterministic synthetic parquet. This module
resolves either into the same frame:

* ``catalog.db.table`` names read through the session catalog
  (``spark.read.table``), which serves Iceberg tables when the Iceberg
  runtime jar + catalog config are on the session (snapshot / as-of-time
  travel supported via the standard read options). Column pruning and
  predicate pushdown reach the Iceberg scan exactly as for parquet — the
  build reads only the five contract columns, so manifests prune files
  and the scan schema stays narrow.
* filesystem paths read as parquet (the sandbox/test path).

No Iceberg classes are imported here — the adapter only *routes* to
Spark's reader, so environments without the runtime jar fail with a
clear error only when a catalog table is actually requested.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DOCS_COLS = ["repo", "path", "commit", "lang", "content"]


def _catalog_serves(spark: SparkSession, name: str) -> bool:
    """Whether the session catalog resolves ``name`` — guarded: a malformed
    identifier or an unconfigured catalog must route to the path fallback,
    not crash resolution."""
    try:
        return spark.catalog.tableExists(name)
    except Exception:  # noqa: BLE001 - any parse/catalog error means "no"
        return False


def read_docs_table(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    as_of_timestamp: str | None = None,
) -> DataFrame:
    """The docs input frame from ``source``.

    ``source`` is either a filesystem path (read as parquet) or a
    catalog table name (read via ``spark.read.table`` / Iceberg when the
    session's catalog serves it). ``snapshot_id`` / ``as_of_timestamp``
    select an Iceberg snapshot (time travel) — build reproducibility at
    scale: an index build pinned to a snapshot re-reads identical bytes
    on resume even while the table keeps committing.
    """
    if snapshot_id is not None and as_of_timestamp is not None:
        raise ValueError("pass snapshot_id OR as_of_timestamp, not both")
    # Routing must not depend on the launch cwd: an unambiguous path shape
    # (a separator or a parquet suffix) reads as parquet; anything else is
    # a bare identifier resolved CATALOG-FIRST, so a stray local file or
    # dir named like the table (e.g. ./db.docs) can never shadow the
    # catalog table the caller asked for. Only when the catalog does not
    # serve the name does a matching local path get a chance.
    path_like = os.path.sep in source or source.endswith(".parquet")
    if not path_like and not _catalog_serves(spark, source):
        path_like = os.path.exists(source)
    if path_like:
        if snapshot_id is not None or as_of_timestamp is not None:
            # silently dropping the pin would defeat the reproducibility
            # the options exist for — fail loudly instead
            raise ValueError(
                f"snapshot_id/as_of_timestamp require a catalog table; "
                f"{source!r} resolves to a filesystem path (parquet has "
                "no time travel)"
            )
        # absolutize local paths: Spark's JVM resolves relative paths
        # against ITS working directory, which need not match the Python
        # process's — the same cwd-dependence this routing exists to kill.
        # URIs (s3://, hdfs://, file://) pass through untouched.
        if "://" not in source:
            source = os.path.abspath(source)
        df = spark.read.parquet(source)
    else:
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", as_of_timestamp)
        try:
            df = reader.table(source)
        except Exception as exc:  # noqa: BLE001 - repackage with context
            raise RuntimeError(
                f"cannot read catalog table {source!r}: the session catalog "
                "does not serve it (for Iceberg tables the runtime jar and "
                "catalog config must be on the session, e.g. "
                "--packages org.apache.iceberg:iceberg-spark-runtime and "
                "spark.sql.catalog.<name>=org.apache.iceberg.spark."
                "SparkCatalog)"
            ) from exc
    missing = [c for c in DOCS_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"input {source!r} lacks docs-contract columns {missing}; "
            f"expected {DOCS_COLS}"
        )
    # narrow projection: only the contract columns reach the build, so
    # pruning pushes to the (parquet or Iceberg) scan
    return df.select(*DOCS_COLS)


def build_index_from_table(
    spark: SparkSession,
    source: str,
    index_root: str,
    cfg=None,
    snapshot_id: int | None = None,
    as_of_timestamp: str | None = None,
) -> dict:
    """Build an index segment directly from a docs table — the north-rule
    ingestion entry (`over Iceberg tables of source-code repositories`):
    ``source`` is a catalog (Iceberg) table name or a parquet path, with
    optional snapshot pinning for reproducible builds; everything after
    the read is the standard :func:`build_segment` path (one content
    shuffle, resumable, lineage-stamped). Returns the manifest."""
    from gofias_spark.config import IndexConfig
    from gofias_spark.index.build import build_segment

    docs = read_docs_table(
        spark, source, snapshot_id=snapshot_id,
        as_of_timestamp=as_of_timestamp,
    )
    return build_segment(spark, docs, index_root, cfg or IndexConfig())


def export_docs_table(
    spark: SparkSession,
    index_root: str,
    dest: str,
    mode: str = "errorifexists",
) -> int:
    """Export the index's LIVE doc store (tombstones netted out) back to
    a docs table — the round-trip counterpart of ``read_docs_table``, so
    the engine slots next to an existing lakehouse: filter/curate inside
    the engine, export the survivors as the next pipeline stage's input.

    ``dest`` routing mirrors ``read_docs_table``: a path-shaped dest
    writes parquet; a bare identifier writes through the session catalog
    via ``DataFrameWriterV2.createOrReplace`` (Iceberg when the catalog
    is configured). Environments without an Iceberg runtime get the same
    actionable error as the reader — the parquet path needs nothing.
    Returns the number of rows exported.

    The export is a single narrow scan of doc_meta (five contract
    columns + an anti-join against the tombstone set) — no index
    structures are touched, and the write parallelism is the scan's.
    """
    from gofias_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_root, cache=False)
    docs = eng.doc_meta
    if eng._tombstones is not None:
        # tombstone set is delta-sized: broadcast anti-join, no shuffle
        # of the doc store
        docs = docs.join(
            eng._tombstones.select("doc_id").hint("broadcast"),
            "doc_id",
            "left_anti",
        )
    docs = docs.select(*DOCS_COLS)
    n = docs.count()
    path_like = os.path.sep in dest or dest.endswith(".parquet")
    if path_like:
        if "://" not in dest:
            dest = os.path.abspath(dest)
        docs.write.mode(mode).parquet(dest)
    else:
        try:
            writer = docs.writeTo(dest)
            if mode in ("overwrite", "createOrReplace"):
                writer.createOrReplace()
            else:
                writer.create()
        except Exception as exc:  # noqa: BLE001 - repackage with context
            raise RuntimeError(
                f"cannot write catalog table {dest!r}: the session catalog "
                "does not serve it (for Iceberg tables the runtime jar and "
                "catalog config must be on the session, e.g. "
                "--packages org.apache.iceberg:iceberg-spark-runtime and "
                "spark.sql.catalog.<name>=org.apache.iceberg.spark."
                "SparkCatalog)"
            ) from exc
    return int(n)
