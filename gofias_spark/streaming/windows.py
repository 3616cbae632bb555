"""Structured Streaming analytics: watermarked windowed aggregation and
stateful streaming sessionization — the streaming forms of
``operators.events.date_histogram`` / ``sessionize``.

The batch operators are the oracle: on a bounded input replayed through a
stream (``availableNow`` trigger), the streaming results must equal the
batch results — tested in tests/test_streaming_windows.py. At scale the
same code runs unbounded with a real source (Kafka/files): the watermark
bounds state, windows emit as event time passes them, and the session
operator's per-user state lives in the state store, partitioned by
user_id across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_date_histogram(
    events: DataFrame,
    interval: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    group_col: str | None = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """Watermarked tumbling-window rollup of an event STREAM — the
    streaming ``date_histogram``: one row per (window, group) with
    ``cnt``/``sum_value``/``avg_value``. Late rows beyond ``watermark``
    are dropped by the engine; state is bounded by (windows within the
    watermark horizon) x groups, never the stream.

    Returns the aggregated streaming DataFrame; the caller picks sink and
    output mode (``update``/``append`` for incremental sinks; ``complete``
    only for small dashboards). The aggregation is the same
    map-side-combinable partial-agg shape as the batch rollup — Spark
    keeps per-window partials in the state store instead of a shuffle."""
    keys = [
        F.window(F.col(ts_col), interval).alias("win"),
    ]
    if group_col is not None:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col is not None:
        aggs += [
            F.round(F.sum(value_col), 4).alias("sum_value"),
            F.round(F.avg(value_col), 4).alias("avg_value"),
        ]
    out = (
        events.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("win.start").alias("bucket"),
        *([group_col] if group_col else []),
        *[c for c in ("cnt", "sum_value", "avg_value")
          if c == "cnt" or value_col is not None],
    )


def stream_sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming session windows (ES has no analogue; this is the
    Structured Streaming ``session_window`` operator): one row per closed
    session with ``(user_id, session_start, session_end, n_events)``.
    A session closes when no event arrives within ``gap_minutes`` of the
    last one — the same gap rule as the batch ``sessionize``, expressed
    through the engine's native session-window state (per-user state in
    the state store, merged incrementally; the watermark evicts sessions
    whose gap has definitely passed).

    Batch/stream parity: on a bounded replay, each user's set of
    (session_start, session_end, n_events) equals what the batch
    ``sessionize``'s session_seq grouping produces — gated in tests."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be > 0")
    gap = f"{int(gap_minutes * 60)} seconds"
    return (
        events.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
