"""Hierarchy enrichment — SURVEY.md §2.4 J1.

The reference denormalizes the FIAS address tree (region→area→city→
settlement→street→house) by processing rows in ascending level order with a
parent cache, concatenating each parent's full_address into its children
(/root/reference/app/infrastructure/persistence/address/elastic/repository/
elasticAddressRepository.go:825-1014; path concat :908-915).

Spark form: a level-ordered loop of self-joins — each iteration joins
level-N rows against the already-enriched parents (broadcast when the parent
level is small, which upper hierarchy levels always are). The level-ordered
invariant ("parents before children") is the same one the reference enforces
via its ordered scroll (O8)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_hierarchy(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    name_col: str = "name",
    level_col: str = "level",
    sep: str = ", ",
    broadcast_parents: bool = True,
) -> DataFrame:
    """Adds ``full_path`` = ancestors' names joined root-first (X6 concat).

    Levels must be 1 (roots) .. max; a node's parent is at any lower level
    (the reference's adjacency list works the same way)."""
    levels = [
        r[0]
        for r in nodes.select(level_col).distinct().orderBy(level_col).collect()
    ]
    enriched = None  # union of processed levels, with full_path
    for lvl in levels:
        cur = nodes.filter(F.col(level_col) == lvl)
        if enriched is None:
            cur = cur.withColumn("full_path", F.col(name_col))
        else:
            parents = enriched.select(
                F.col(id_col).alias("_pid"),
                F.col("full_path").alias("_ppath"),
            )
            if broadcast_parents:
                parents = F.broadcast(parents)
            cur = (
                cur.join(parents, cur[parent_col] == parents["_pid"], "left")
                .withColumn(
                    "full_path",
                    F.when(
                        F.col("_ppath").isNotNull(),
                        F.concat_ws(sep, F.col("_ppath"), F.col(name_col)),
                    ).otherwise(F.col(name_col)),
                )
                .drop("_pid", "_ppath")
            )
        enriched = (
            cur if enriched is None else enriched.unionByName(cur)
        )
        # materialize each level so the next join reads a stable, small side
        # (the parent side of every join is a finished level — the same
        # "parents before children" guarantee as the reference's ordered
        # scroll + cache)
        enriched = enriched.localCheckpoint(eager=True)
    return enriched
