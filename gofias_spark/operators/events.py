"""Event-stream analytics operators: date-histogram rollups and gap-based
sessionization over a timestamped event table.

The reference's search surface is Elasticsearch, whose aggregation DSL
pairs every index with ``date_histogram`` rollups (the engine's facets /
histogram / percentiles already mirror the numeric aggs; this completes
the time dimension). Sessionization is the canonical stateful-stream
operator (Structured Streaming expresses it with
``applyInPandasWithState``); the batch formulation here is the
deterministic, oracle-checkable equivalent used for backfills.

Scale shape:
  * ``date_histogram`` — one map-side-combinable groupBy on a derived
    bucket column (``date_trunc`` is a pure function of the row), shuffle
    bounded by #buckets x #event_types x #partitions partial rows, never
    the events.
  * ``sessionize`` — one shuffle keyed on ``user_id`` (the window
    partition key); within a user, the session id is a running sum of
    gap-break flags, computed per-partition after the hash exchange —
    no global window, so 10^12 events parallelize across users. A skewed
    power-user key is bounded by that user's own event count (mitigable
    upstream by splitting on (user_id, day) when sessions never span
    days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def date_histogram(
    events: DataFrame,
    interval: str = "day",
    ts_col: str = "ts",
    group_col: str | None = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """ES ``date_histogram`` (calendar_interval=``interval``) with an
    optional terms sub-bucket and avg/sum metric sub-aggregations:
    one row per (bucket, group) with ``cnt``, ``sum_value``, ``avg_value``.
    Buckets with no events are omitted (ES min_doc_count=1 — densifying a
    sparse range is a driver-side one-liner, not a distributed concern).

    ``interval`` is any ``date_trunc`` unit (year/quarter/month/week/day/
    hour/minute). Plans as scan -> partial hash agg -> exchange of the
    tiny partial rows -> final agg: the classic map-side-combine rollup.
    """
    if interval.lower() not in (
        "year", "quarter", "month", "week", "day", "hour", "minute",
    ):
        raise ValueError(f"unsupported date_histogram interval {interval!r}")
    keys = [F.date_trunc(interval, F.col(ts_col)).alias("bucket")]
    if group_col is not None:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col is not None:
        aggs += [
            F.round(F.sum(value_col), 4).alias("sum_value"),
            F.round(F.avg(value_col), 4).alias("avg_value"),
        ]
    out = events.filter(F.col(ts_col).isNotNull()).groupBy(*keys).agg(*aggs)
    order = ["bucket"] + ([group_col] if group_col else [])
    return out.orderBy(*order)


def histogram_pipeline(
    buckets: DataFrame,
    value_col: str = "cnt",
    bucket_col: str = "bucket",
    group_col: str | None = "event_type",
    window: int = 3,
) -> DataFrame:
    """ES *pipeline aggregations* over a parent histogram's buckets:
    ``derivative`` (bucket-over-bucket delta, null for each group's first
    bucket — ES emits no derivative there), ``cumulative_sum``, and
    ``moving_fn`` as a trailing average over the last ``window`` buckets
    INCLUDING the current one (ES ``shift=1`` convention; stated here
    because ES's default ``shift=0`` window excludes the current bucket).

    Input is the OUTPUT of :func:`date_histogram` (or any (bucket, group,
    value) rollup) — pipeline aggs consume sibling buckets, never events,
    exactly like ES evaluates them on the reduced aggregation tree. So
    the window runs over #buckets rows per group: with ``group_col`` the
    plan is one hash exchange on the group key then a per-group linear
    scan; without it, a single-partition window over the bucket list —
    fine because a histogram's bucket count is bounded (ES caps at
    search.max_buckets=65536), not corpus-sized.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if group_col:
        w = Window.partitionBy(group_col).orderBy(F.col(bucket_col).asc())
    else:
        w = Window.orderBy(F.col(bucket_col).asc())
    val = F.col(value_col)
    mov = w.rowsBetween(-(window - 1), Window.currentRow)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = buckets.select(
        "*",
        (val - F.lag(value_col).over(w)).alias("derivative"),
        F.sum(value_col).over(cum).alias("cumulative_sum"),
        F.round(F.avg(value_col).over(mov), 6).alias("moving_avg"),
    )
    order = [bucket_col] + ([group_col] if group_col else [])
    return out.orderBy(*order)


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based session assignment: within a user's time-ordered events,
    a new session starts when the gap from the previous event exceeds
    ``gap_minutes``. Returns one row per event:
    ``(event_id, user_id, ts, session_seq)`` where ``session_seq`` is the
    user's 1-based session number — deterministic, so batch backfills and
    the streaming formulation (session windows with watermarks) agree.

    The window is partitioned by ``user_col``: one hash exchange, then a
    per-user linear scan (lag + running sum of break flags). No global
    ordering anywhere.
    """
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be > 0")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(id_col).asc())
    prev_ts = F.lag(ts_col).over(w)
    # exact integer microseconds (unix_micros), not a double cast of the
    # timestamp: double(ts) rounds to ~2^-22 s near epoch-scale values, so
    # two rounded doubles subtracted could flip a gap sitting exactly at
    # the timeout — integer arithmetic matches any SQL oracle bit-for-bit
    # NTZ columns cast to TIMESTAMP first (unix_micros requires it); the
    # session-tz interpretation shifts both ends identically, so gaps are
    # unaffected (sessions never straddle a DST jump under UTC sessions)
    gap_us = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(prev_ts.cast("timestamp"))
    )
    new_sess = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60_000_000.0), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.filter(F.col(ts_col).isNotNull())
        .select(id_col, user_col, ts_col, new_sess.alias("_brk"))
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("_brk")
    )


def bucket_script(buckets: DataFrame, exprs: dict[str, str]) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: derive new per-bucket metrics
    from the bucket's existing metric columns via SQL expressions (the
    ES form evaluates a Painless script over ``buckets_path`` values; the
    engine form is a Catalyst expression over the rollup's columns —
    fully codegen'd, zero extra passes).

    ``exprs`` maps new column name -> SQL expression string, e.g.
    ``{"avg_value": "sum_value / cnt"}``.

    Like all pipeline aggs this consumes the reduced bucket tree, never
    events: a pure projection over #buckets rows.
    """
    out = buckets
    for name, sql in exprs.items():
        out = out.withColumn(name, F.expr(sql))
    return out


def bucket_selector(buckets: DataFrame, condition: str) -> DataFrame:
    """ES ``bucket_selector`` pipeline agg: keep only buckets whose
    metrics satisfy ``condition`` (SQL boolean expression over the bucket
    row, e.g. ``"cnt >= 10 AND sum_value > 0"``). A filter over the
    reduced aggregation tree — evaluated post-agg exactly as ES does."""
    return buckets.filter(F.expr(condition))


def bucket_sort(
    buckets: DataFrame,
    sort_by: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``bucket_sort`` pipeline agg: order sibling buckets by metric
    columns and truncate (``from``/``size``), optionally per parent group
    (ES nests bucket_sort under the parent multi-bucket agg; passing
    ``group_col`` reproduces that nesting).

    With ``group_col`` the plan is one hash exchange on the group key and
    a per-group ``row_number`` scan; without it, a single ordered pass
    over the bucket list — bounded by ES's search.max_buckets, never
    corpus-sized.
    """
    if from_ < 0:
        raise ValueError("from_ must be >= 0")
    cols = [
        F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
        for c, d in sort_by
    ]
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(*cols)
        out = buckets.withColumn("_rn", F.row_number().over(w))
        hi = from_ + size if size is not None else None
        cond = F.col("_rn") > from_
        if hi is not None:
            cond = cond & (F.col("_rn") <= hi)
        return out.filter(cond).drop("_rn").orderBy(group_col, *cols)
    out = buckets.orderBy(*cols)
    if from_:
        out = out.offset(from_)
    if size is not None:
        out = out.limit(size)
    return out


def bucket_stats(
    buckets: DataFrame,
    value_col: str = "cnt",
    group_col: str | None = None,
) -> DataFrame:
    """ES sibling pipeline aggs ``stats_bucket`` (subsuming avg_bucket /
    sum_bucket / min_bucket / max_bucket): aggregate a metric ACROSS the
    sibling buckets of a parent, one output row per parent group (or one
    global row). Returns ``n_buckets, min_v, max_v, sum_v, avg_v``.

    A second-level rollup over #buckets rows — the shuffle carries a few
    partial rows per group, nothing event-sized.
    """
    val = F.col(value_col)
    aggs = [
        F.count(F.lit(1)).alias("n_buckets"),
        F.min(val).alias("min_v"),
        F.max(val).alias("max_v"),
        F.round(F.sum(val).cast("double"), 4).alias("sum_v"),
        F.round(F.avg(val), 4).alias("avg_v"),
    ]
    if group_col is not None:
        return buckets.groupBy(group_col).agg(*aggs).orderBy(group_col)
    return buckets.agg(*aggs)


def date_range_agg(
    events: DataFrame,
    ranges: list[tuple[str | None, str | None]],
    ts_col: str = "ts",
) -> DataFrame:
    """ES ``date_range`` aggregation: doc counts per ``[from, to)``
    timestamp range (from-inclusive / to-exclusive, ES's contract; None =
    open end; ranges may overlap — each is counted independently).
    Bounds are ISO date/timestamp strings. Returns one row per range in
    the given order with ES-style keys ``"from-to"`` / ``"*-to"`` /
    ``"from-*"``: ``(range, cnt)``.

    All ranges are evaluated in ONE pass as conditional-sum aggregates
    (``sum(when(cond, 1))`` per range) — a single scan producing one
    scalar row, no shuffle of events and no per-range jobs; the row is
    then unpivoted driver-side (#ranges values).
    """
    if not ranges:
        raise ValueError("ranges must be non-empty")
    ts = F.col(ts_col).cast("timestamp")
    aggs, keys = [], []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ts >= F.to_timestamp(F.lit(lo)))
        if hi is not None:
            cond = cond & (ts < F.to_timestamp(F.lit(hi)))
        keys.append(f"{lo if lo is not None else '*'}-"
                    f"{hi if hi is not None else '*'}")
        aggs.append(
            F.coalesce(
                F.sum(F.when(cond, F.lit(1))), F.lit(0)
            ).cast("long").alias(f"_c{i}")
        )
    row = events.filter(ts.isNotNull()).agg(*aggs).collect()[0]
    spark = events.sparkSession
    return spark.createDataFrame(
        [(kk, int(row[f"_c{i}"])) for i, kk in enumerate(keys)],
        "range string, cnt long",
    )


# calendar ladder for auto_date_histogram, coarse -> fine, with the rough
# seconds-per-bucket used to pick the finest interval that still fits the
# target bucket budget (ES's RoundingInfo ladder, sans sub-minute tiers)
_AUTO_LADDER = (
    ("year", 365 * 86400.0),
    ("quarter", 91 * 86400.0),
    ("month", 30 * 86400.0),
    ("week", 7 * 86400.0),
    ("day", 86400.0),
    ("hour", 3600.0),
    ("minute", 60.0),
)


def auto_date_histogram(
    events: DataFrame,
    target_buckets: int = 10,
    ts_col: str = "ts",
    group_col: str | None = None,
    value_col: str | None = None,
) -> tuple[str, DataFrame]:
    """ES ``auto_date_histogram``: pick the FINEST calendar interval whose
    bucket count stays within ``target_buckets`` (ES halves/rounds the
    same way down its RoundingInfo ladder), then run the ordinary
    :func:`date_histogram` at it. Returns ``(interval, buckets)`` — ES
    reports the chosen ``interval`` in the response the same way.

    Cost: ONE scalar min/max aggregation over the timestamp column
    (map-side combined) to choose the interval, then the standard
    single-rollup histogram — two jobs total, independent of bucket
    count; no trial-and-error re-aggregation.
    """
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")
    ts = F.col(ts_col).cast("timestamp")
    row = events.filter(ts.isNotNull()).agg(
        F.min(ts).alias("lo"), F.max(ts).alias("hi")
    ).collect()[0]
    if row["lo"] is None:
        return "day", date_histogram(
            events, "day", ts_col=ts_col, group_col=group_col,
            value_col=value_col,
        )
    span = (row["hi"] - row["lo"]).total_seconds()
    interval = _AUTO_LADDER[0][0]
    for name, secs in _AUTO_LADDER:
        # buckets at this tier (ceil of span over width, min 1)
        if span / secs < target_buckets:
            interval = name
        else:
            break
    return interval, date_histogram(
        events, interval, ts_col=ts_col, group_col=group_col,
        value_col=value_col,
    )
