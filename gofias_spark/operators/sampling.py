"""Dataset-mixing operators for training-data pipelines: deterministic
stratified sampling and token-budget sequence packing.

Both are corpus-shaping steps a 100-TB curation pipeline runs between
dedup and tokenization: sampling rebalances strata (e.g. languages or
sources) to a target mixture; packing assigns documents to fixed
token-budget shards so downstream tokenizer/trainer workers receive
near-uniform work units.

Scale shape:
  * ``stratified_sample`` — pure map: the keep decision is a hash of the
    row's own id against the stratum's rate. No shuffle, no RNG state, no
    driver coordination; re-running at any partitioning or cluster size
    selects the SAME rows (unlike ``DataFrame.sample``, whose output
    depends on partition layout). That determinism is what makes the
    oracle — and reproducible dataset cards — possible.
  * ``pack_sequences`` — the classic distributed prefix-sum: range-
    partition by the global order key, per-partition token subtotals
    (tiny: one row per partition) come to the driver, cumulative offsets
    broadcast back, then each partition computes its local running sum
    independently. No single-partition global window, so 10^12 docs pack
    in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofias_spark.query.naive import tokens_col


def _unit_hash(col) -> "F.Column":
    """Deterministic uniform [0,1) from a row id: the first 8 hex chars of
    md5(id-as-string) as an integer over 2^32. md5 (not xxhash64) so exact
    SQL oracles exist in any engine; the id is rendered as a plain decimal
    string on both sides."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row kept iff ``md5-hash(id) / 2^32 < rate(stratum)``. Strata absent
    from ``rates`` (and null strata) use ``default_rate``; rate 1.0 keeps
    everything, 0.0 drops everything. Returns the input rows unchanged
    (plus nothing — the decision column is internal).

    This is the reproducible version of per-stratum ``sample()``: the
    same (id, rates) always selects the same subset, independent of
    partitioning, task order, or cluster size — the property dataset
    cards and incremental re-runs need.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == s, F.lit(float(r))).otherwise(rate)
    return docs.filter(_unit_hash(F.col(id_col)) < rate)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "content",
    num_parts: int = 32,
) -> DataFrame:
    """Contiguous token-budget packing: walk the corpus in ``id_col``
    order, accumulate per-doc token counts, and assign each doc the bin
    ``floor(tokens_before_it / budget)`` — the streaming
    concat-then-split sharding used to build fixed-budget training
    shards. Returns ``(id, n_tokens, bin_id)``.

    A doc longer than the budget still lands in exactly one bin (the one
    its prefix sum falls in) — bins are *approximately* budget-sized with
    doc-boundary spill, the standard trade against splitting documents.

    Distributed prefix sum: ``repartitionByRange`` on the order key gives
    sorted, non-overlapping partitions; per-partition token subtotals
    (one tiny row each) are collected, turned into cumulative offsets,
    and broadcast back so each partition finishes its running sum
    locally. The only full-data movement is the single range exchange.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    counted = docs.select(
        F.col(id_col).alias("_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    ).repartitionByRange(num_parts, "_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    # pass 1: per-partition subtotals (one tiny row per partition). Both
    # jobs below run over the SAME `counted` frame (one RDD lineage), so
    # the range-exchange map stage is computed once and its shuffle output
    # reused — the second pass sees identical partition boundaries by
    # construction, not by hoping the range sampler re-samples the same
    # bounds.
    subtotal = {
        int(r["_pid"]): int(r["s"])
        for r in counted.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotal):
        offsets[pid] = acc
        acc += subtotal[pid]
    off_col = F.lit(0).cast("long")
    for pid, off in sorted(offsets.items()):
        off_col = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(off_col)
    # pass 2: per-partition running sum after the broadcast offsets —
    # Window.partitionBy(_pid) keeps every partition's scan independent
    w = (
        Window.partitionBy("_pid")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        counted.withColumn(
            "_before",
            off_col + F.sum("n_tokens").over(w) - F.col("n_tokens"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.floor(F.col("_before") / budget).alias("bin_id"),
        )
    )
