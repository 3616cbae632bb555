"""histogram_pipeline: ES pipeline aggregations (derivative /
cumulative_sum / moving_fn trailing avg) over a parent histogram's
buckets — verified against a brute-force pandas recomputation of the
same definitions.
"""

import datetime as dt

import pytest

from gofias_spark.operators.events import date_histogram, histogram_pipeline


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for day, (a, b) in enumerate([(3, 1), (5, 2), (2, 2), (7, 0), (4, 3)]):
        for i in range(a):
            rows.append((eid, "u1", base + dt.timedelta(days=day, hours=i),
                         "click", float(i)))
            eid += 1
        for i in range(b):
            rows.append((eid, "u2", base + dt.timedelta(days=day, hours=i),
                         "view", float(i * 2)))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, user_id string, ts timestamp, event_type string, "
        "value double",
    )


def test_pipeline_matches_bruteforce(events):
    out = (
        histogram_pipeline(date_histogram(events, "day"), window=3)
        .orderBy("event_type", "bucket")
        .toPandas()
    )
    for _, g in out.groupby("event_type"):
        cnts = g["cnt"].tolist()
        # derivative: bucket-over-bucket delta, first bucket null
        assert g["derivative"].iloc[0] is None or g["derivative"].isna().iloc[0]
        for i in range(1, len(cnts)):
            assert g["derivative"].iloc[i] == cnts[i] - cnts[i - 1]
        # cumulative_sum: running total
        run = 0
        for i, c in enumerate(cnts):
            run += c
            assert g["cumulative_sum"].iloc[i] == run
        # moving_avg: trailing window of 3 INCLUDING current
        for i in range(len(cnts)):
            w = cnts[max(0, i - 2) : i + 1]
            assert g["moving_avg"].iloc[i] == pytest.approx(
                round(sum(w) / len(w), 6)
            )


def test_no_group_single_series(events):
    h = date_histogram(events, "day", group_col=None, value_col=None)
    out = histogram_pipeline(h, group_col=None, window=2).toPandas()
    cnts = out["cnt"].tolist()
    assert out["cumulative_sum"].tolist() == [
        sum(cnts[: i + 1]) for i in range(len(cnts))
    ]
    assert out["moving_avg"].iloc[-1] == pytest.approx(
        round((cnts[-2] + cnts[-1]) / 2, 6)
    )


def test_window_validation(events):
    h = date_histogram(events, "day")
    with pytest.raises(ValueError):
        histogram_pipeline(h, window=0)
