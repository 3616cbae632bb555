"""Streaming/batch parity: a bounded event set replayed through
Structured Streaming (file source, availableNow trigger) must produce the
same rollups as the batch operators — stream_date_histogram vs
date_histogram, stream_sessionize vs sessionize's session grouping."""

import datetime as dt
import uuid

import pytest

from gofias_spark.operators.events import date_histogram, sessionize
from gofias_spark.streaming.windows import (
    stream_date_histogram,
    stream_sessionize,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events():
    rows = []
    eid = 0
    for user in range(1, 6):
        t = T0 + dt.timedelta(minutes=3 * user)
        for burst in range(user):  # user N has N sessions
            for j in range(3):
                eid += 1
                rows.append((
                    eid, t, user,
                    "click" if (eid % 2) == 0 else "view",
                    float(eid % 7),
                ))
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)  # > 30-min gap: next session
    return rows


SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double")


@pytest.fixture(scope="module")
def replay(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("evsrc"))
    spark.createDataFrame(_events(), SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    return batch, stream


def _run_to_memory(streaming_df, mode):
    name = "t" + uuid.uuid4().hex[:12]
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_stream_date_histogram_equals_batch(spark, replay):
    batch, stream = replay
    name = _run_to_memory(
        stream_date_histogram(stream, "1 hour", watermark="10 minutes"),
        "complete",
    )
    got = {
        (r["bucket"], r["event_type"], r["cnt"], r["sum_value"])
        for r in spark.table(name).collect()
    }
    exp = {
        (r["bucket"], r["event_type"], r["cnt"], r["sum_value"])
        for r in date_histogram(batch, "hour").collect()
    }
    assert got == exp and len(got) > 2


def test_stream_sessionize_equals_batch(spark, replay):
    batch, stream = replay
    name = _run_to_memory(
        stream_sessionize(stream, gap_minutes=30, watermark="0 seconds"),
        "complete",
    )
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table(name).collect()
    }
    # batch oracle: group the batch sessionizer's (user, session_seq)
    # assignment into (user, first_ts, n_events) triples
    sess = sessionize(batch, gap_minutes=30).toPandas()
    exp = {
        (int(u), s["ts"].min().to_pydatetime(), int(len(s)))
        for (u, _), s in sess.groupby(["user_id", "session_seq"])
    }
    assert got == exp
    # user N has N sessions of 3 events each
    per_user = {}
    for u, _, n in got:
        per_user.setdefault(u, []).append(n)
    assert {u: sorted(v) for u, v in per_user.items()} == {
        u: [3] * u for u in range(1, 6)
    }
