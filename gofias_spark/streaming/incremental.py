"""Incremental maintenance driver — SURVEY.md §2.9 ST1/ST6.

The reference's delta-import loop fetches the dump-version list, replays
versions older->newer until the stored watermark, and bumps the version doc
(/root/reference/app/domain/address/service/importService.go:57-103;
version bookkeeping versionRepository.go:81-119; full-vs-delta decision
domain/address/delivery/cli/handler.go:28-48).

Spark form: versions are (version_id, upserts_path, deletes_path) rows; the
manifest's ``applied_versions`` list is the watermark. Absent manifest =>
full import of the base snapshot; present => replay unapplied versions in
order through ``apply_delta``. Also provides a Structured-Streaming hook:
``stream_deltas`` micro-batches a directory of delta files into the same
merge path via foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import DOCS_SCHEMA
from gofias_spark.index.build import build_segment
from gofias_spark.index.merge import apply_delta
from gofias_spark.index.store import IndexStore


def check_updates(
    spark: SparkSession,
    index_root: str,
    base_docs: DataFrame,
    versions: list[dict],
    cfg: IndexConfig | None = None,
) -> dict:
    """Full-or-delta decision + replay loop (handler.go:28-48 analogue).

    ``versions``: [{"version_id": int, "upserts": path|None,
    "deletes": path|None}, ...] — replayed ascending, skipping applied ones.
    Returns the final manifest."""
    store = IndexStore(index_root)
    if not store.exists():
        manifest = build_segment(spark, base_docs, index_root, cfg)
    else:
        manifest = store.read_manifest()
    applied = set(manifest.get("applied_versions", []))
    for v in sorted(versions, key=lambda v: v["version_id"]):
        if v["version_id"] in applied:
            continue
        upserts = (
            spark.read.schema(DOCS_SCHEMA).parquet(v["upserts"])
            if v.get("upserts")
            else None
        )
        deletes = (
            spark.read.parquet(v["deletes"]) if v.get("deletes") else None
        )
        manifest = apply_delta(
            spark, index_root, upserts=upserts, deletes=deletes, cfg=cfg
        )
        applied.add(v["version_id"])
        manifest["applied_versions"] = sorted(applied)
        store.write_manifest(manifest)
    return manifest


def propagate_dependents(
    spark: SparkSession,
    index_root: str,
    changed_parents: DataFrame,
    dependents: DataFrame,
    fk: str | list[str],
    derive,
    cfg: IndexConfig | None = None,
) -> dict:
    """ST5 change propagation (importService.go:222-293): when parent
    entities change (the reference's street-level IndexObjects flowing
    through indexChan, elasticAddressRepository.go:1026-1031), every
    dependent document whose foreign key references a changed parent is
    re-derived and MERGEd back into the index (the reference's house
    re-index, elasticHouseRepository.go:537-581).

    ``changed_parents`` — the changed parent rows (any schema containing the
    fk columns plus whatever ``derive`` needs).
    ``dependents`` — the dependent source table.
    ``fk`` — join column(s) present in both.
    ``derive(affected_dependents, changed_parents) -> docs-schema DataFrame``
    — re-derivation (e.g. re-concatenate the parent's display name into the
    dependent's content, X6 analogue).

    Scale shape: one equi-join keyed on the changed foreign keys — the
    changed-parent side is delta-sized, so Catalyst broadcasts it; the
    dependent scan prunes to matching keys. Work is proportional to the
    delta's blast radius, never the full corpus.
    """
    keys = [fk] if isinstance(fk, str) else list(fk)
    from pyspark.sql import functions as F

    changed_keys = changed_parents.select(*keys).distinct()
    affected = dependents.join(F.broadcast(changed_keys), keys, "inner")
    docs = derive(affected, changed_parents)
    return apply_delta(spark, index_root, upserts=docs, cfg=cfg)


def stream_deltas(
    spark: SparkSession,
    index_root: str,
    delta_dir: str,
    checkpoint_dir: str,
    cfg: IndexConfig | None = None,
):
    """Structured Streaming ingestion of delta files: each micro-batch of
    docs-schema rows is MERGEd into the index (upsert semantics; a row with
    null content is treated as a delete of its (repo, path) key).

    Returns the StreamingQuery; caller manages lifecycle."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        deletes = batch_df.filter(F.col("content").isNull()).select(
            "repo", "path"
        )
        upserts = batch_df.filter(F.col("content").isNotNull())
        apply_delta(
            spark,
            index_root,
            upserts=upserts if not upserts.isEmpty() else None,
            deletes=deletes if not deletes.isEmpty() else None,
            cfg=cfg,
        )

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
