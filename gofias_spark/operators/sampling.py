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
from pyspark.storagelevel import StorageLevel

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

    Distributed prefix sum with DRIVER-PINNED range bounds: one cheap
    quantile pass over the id column fixes ``num_parts`` cut points, and
    every row's range id (``_pid``) is then a pure function of its own id
    — identical in every job that evaluates it. (``repartitionByRange``
    would be the obvious spelling, but its boundaries come from a sampler
    that re-runs per ACTION: the subtotal job and the window job each
    re-plan the exchange, and boundaries that drift between them would
    credit a boundary row's offset to the wrong partition. Pinning the
    bounds on the driver makes the two passes agree by construction.)
    Per-partition token subtotals (one tiny row each) are collected,
    turned into cumulative offsets, and broadcast back so each range
    finishes its running sum locally; only (id, n_tokens) ever shuffles.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    # bounds: num_parts-1 cut points over the id distribution — a
    # column-pruned scan of the id column only (no tokenize)
    probs = [i / num_parts for i in range(1, num_parts)]
    bounds = sorted(set(
        docs.select(F.col(id_col).cast("double").alias("_idq"))
        .approxQuantile("_idq", probs, 0.01)
    )) if num_parts > 1 else []
    pid_col = F.lit(0)
    for b in bounds:  # _pid = number of bounds strictly below the id
        pid_col = pid_col + (F.col("_id").cast("double") > F.lit(b)).cast(
            "int"
        )
    counted = docs.select(
        F.col(id_col).alias("_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn("_pid", pid_col)
    # Persist the counted projection: it feeds BOTH the subtotal pass and
    # the window pass, and without the cache each pass re-tokenizes the
    # full corpus (the dominant cost — measured ~2x at 200k docs). The
    # cached rows are (id, n_tokens, pid) — ~24 bytes/doc, spillable —
    # vs re-reading and re-splitting every content byte. Released when
    # Spark evicts it (or via spark.catalog.clearCache()).
    counted = counted.persist(StorageLevel.MEMORY_AND_DISK)
    # pass 1: per-partition subtotals (one tiny row per range) — also
    # materializes the cache
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


def temperature_rates(
    counts: dict[str, int], alpha: float = 0.7, scale: float | None = None
) -> dict[str, float]:
    """Per-group keep rates for temperature-based mixture sampling
    (the dataset-mixing rule of GPT-3 / PaLM / XLM-R: a group with share
    ``p`` is sampled with weight proportional to ``p**alpha``, alpha<1
    flattening the mixture toward small groups).

    Returns, per group, the keep probability that realizes the
    temperature mixture by DOWN-sampling only (no duplication):
    ``rate(g) = scale * p_g**alpha / count_g`` normalized so the largest
    rate is 1.0 unless an explicit ``scale`` is given. Deterministic,
    driver-side arithmetic over the tiny (group, count) dict — pair with
    :func:`stratified_sample` for the distributed filter.
    """
    if not counts:
        return {}
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    total = float(sum(counts.values()))
    if total <= 0:
        return {g: 0.0 for g in counts}
    weights = {g: (c / total) ** alpha for g, c in counts.items() if c > 0}
    wsum = sum(weights.values())
    # target share per group under the tempered mixture
    target = {g: w / wsum for g, w in weights.items()}
    # unnormalized keep rate realizing the share by down-sampling
    raw = {g: target[g] / counts[g] for g in target}
    s = scale if scale is not None else 1.0 / max(raw.values())
    out = {g: min(1.0, raw[g] * s) for g in raw}
    for g, c in counts.items():
        if c <= 0:
            out[g] = 0.0
    return out


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.7,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture sampling over a grouped corpus: measure
    group sizes (ONE map-side-combinable groupBy producing #groups tiny
    rows), derive tempered keep rates driver-side
    (:func:`temperature_rates`), then apply the deterministic
    md5-threshold filter (:func:`stratified_sample`) — the whole plan is
    a count rollup plus a pure map-stage filter, reproducible across
    partitioning and cluster size. Null groups are dropped (rate 0).
    """
    rows = (
        docs.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts = {r[group_col]: int(r["cnt"]) for r in rows}
    rates = temperature_rates(counts, alpha=alpha)
    return stratified_sample(
        docs, rates, stratum_col=group_col, id_col=id_col, default_rate=0.0
    )
